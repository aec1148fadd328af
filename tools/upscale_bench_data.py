#!/usr/bin/env python
"""Deterministic bench-scale data: replicate sf0.1 K× with key offsets.

The driver ships sf0.001/0.01/0.1 only; every round-2 perf number was
therefore fixed-overhead-dominated (VERDICT r2 "Next round" #1). This
tool builds sf1 (K=10) and sf10 (K=100) **bench-only** variants of the
three tables the engine actually reads (events / documents /
embeddings) by replicating sf0.1 with disjoint key ranges — corpus
growth = more conversations / more documents, the way a real corpus
scales — plus a per-replica perturbation so replicas are not
cross-replica near-duplicates (which would make the dedup workload
superlinear in K instead of a clean K× scale point):

- events   : event_id += k*100_000, user_id += k*1_500 (new
             conversations); props gains a deterministic ``"r": k``
             JSON field for k>0 (final-brace regex replace, safe for
             nested JSON) so per-turn text differs per replica.
- documents: doc_id += k*5_000; every NON-STOPWORD whitespace token
             gains suffix ``r{k}`` for k>0 — a word-level injection
             (suffixed words carry a digit, stopwords never do), so
             *within* a replica the shingle/Jaccard structure (incl.
             planted near-dup pairs) is preserved exactly, stopword
             counts / lang-ID / n_words are IDENTICAL to replica 0
             (quality-gate selectivity comparable across SFs), and
             cross-replica shingle overlap is limited to all-stopword
             n-grams (far below any near-dup threshold). n_chars
             recomputed.
- embeddings: vec_id += k*2_000; per-dimension deterministic ±1 sign
             pattern keyed by k (integer-hash parity, no RNG), plus a
             k%64 roll — a signed permutation, i.e. orthogonal and
             norm-preserving; within-replica cosines are BIT-EXACT
             (both vectors of a pair see the same signs:
             dot(s∘a, s∘b) = dot(a,b)). Cross-replica coherence sits
             AT the isotropic floor: replica-vs-replica pairs ≥0.45
             measure 326–369 per 4M — the same 341/4M rate the base
             corpus shows against truly random unit vectors at dim 64
             (verified), so no orthogonal decorrelation can do better;
             cross-replica near-dup counts grow at exactly the
             background rate a real corpus of independent vectors
             would show, not as replica artifacts.

No RNG, no wall clock — same bytes on every run. Remaining TPC-H dims
are copied as-is (nothing in bench reads them, but the audit tooling
expects the full table set).

Usage:  python tools/upscale_bench_data.py [outroot]
Writes  {outroot}/sf1/*.parquet and {outroot}/sf10/*.parquet
        (default outroot /root/repo/benchdata; ~0.5 GB total).
"""

from __future__ import annotations

import os
import re
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
from flink_cdc_mysql_sink_to_mysql_spark.functions.text import (  # noqa: E402
    STOPWORDS,
)

# the union stopword list: these tokens keep their surface form in every
# replica so per-doc stopword counts (and hence lang-ID + quality-gate
# selectivity) are identical across replicas
_STOP_UNION = frozenset(w for ws in STOPWORDS.values() for w in ws)

SRC = "/root/testdata/sf0.1"
COPY_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
]

EVENT_OFF = 100_000
USER_OFF = 1_500
DOC_OFF = 5_000
VEC_OFF = 2_000


def _events_replica(t: pa.Table, k: int) -> pa.Table:
    import pyarrow.compute as pc

    cols = {name: t[name] for name in t.column_names}
    cols["event_id"] = pc.add(t["event_id"], pa.scalar(k * EVENT_OFF, pa.int64()))
    cols["user_id"] = pc.add(t["user_id"], pa.scalar(k * USER_OFF, pa.int64()))
    if k > 0:
        # '{"k": 76}' -> '{"k": 76, "r": 3}' — per-replica turn text.
        # Replace only the FINAL closing brace (anchored regex), so a
        # nested-JSON props value ending in '}}' stays valid.
        cols["props"] = pc.replace_substring_regex(
            t["props"], pattern=r"\}$", replacement=f', "r": {k}}}'
        )
    return pa.table(cols)


def _documents_replica(t: pa.Table, k: int) -> pa.Table:
    import pyarrow.compute as pc

    cols = {name: t[name] for name in t.column_names}
    cols["doc_id"] = pc.add(t["doc_id"], pa.scalar(k * DOC_OFF, pa.int64()))
    if k > 0:
        token_rx = re.compile(r"\S+")
        suffix = f"r{k}"

        def _suffix_tokens(s: str) -> str:
            # stopwords keep their surface form (identical per-doc
            # stopword counts / lang-ID across replicas); every other
            # token gains the digit-bearing suffix — injective within a
            # replica (stopwords are alphabetic, suffixed words are not)
            return token_rx.sub(
                lambda m: m.group(0)
                if m.group(0).lower() in _STOP_UNION
                else m.group(0) + suffix,
                s,
            )

        txt = t["text"].to_pandas().map(_suffix_tokens)
        cols["text"] = pa.array(txt, pa.string())
        cols["n_chars"] = pa.array(txt.str.len().astype("int64"), pa.int64())
    return pa.table(cols)


def _embeddings_replica(t: pa.Table, k: int) -> pa.Table:
    import pyarrow.compute as pc

    cols = {name: t[name] for name in t.column_names}
    cols["vec_id"] = pc.add(t["vec_id"], pa.scalar(k * VEC_OFF, pa.int64()))
    if k > 0:
        emb = np.stack(t["embedding"].to_pandas().to_numpy())  # (n, dim)
        dim = emb.shape[1]
        emb = np.roll(emb, k % dim, axis=1)
        # per-dim ±1 signs from deterministic integer hashing (Knuth
        # multiplicative + xorshift parity — no RNG, stable across
        # runs): within-replica pair cosines are bit-exact (both
        # vectors see the same signs), cross-replica dots become
        # half-cancelling signed sums. A bare roll preserved enough
        # structure to leak ~340 cross-replica pairs above cos 0.45
        # per replica pair.
        h = (np.arange(dim, dtype=np.uint64) + np.uint64(k)) * np.uint64(
            2654435761
        )
        h ^= h >> np.uint64(13)
        h *= np.uint64(0x9E3779B97F4A7C15)
        h ^= h >> np.uint64(7)
        signs = ((h >> np.uint64(1)) & np.uint64(1)).astype(np.float32) * 2 - 1
        emb = emb * signs[None, :]
        cols["embedding"] = pa.array(list(emb), pa.list_(pa.float32()))
    return pa.table(cols)


_REPLICATORS = {
    "events": _events_replica,
    "documents": _documents_replica,
    "embeddings": _embeddings_replica,
}


def upscale(outdir: str, factor: int, stream: bool | None = None) -> None:
    stream = factor > 100 if stream is None else stream
    os.makedirs(outdir, exist_ok=True)
    for name in COPY_TABLES:
        shutil.copyfile(
            f"{SRC}/{name}.parquet", f"{outdir}/{name}.parquet"
        )
    for name, fn in _REPLICATORS.items():
        src = pq.read_table(f"{SRC}/{name}.parquet")
        if not stream:
            out = pa.concat_tables([fn(src, k) for k in range(factor)])
            # genuinely splittable scans: ≥32 row groups per file even
            # for the smallest upscaled table (sf1 embeddings, 20k
            # rows) — the earlier 131_072 left sf1 docs/embeddings as
            # ONE row group, the exact degenerate layout the engine's
            # split repair exists to diagnose, and skewed any reader
            # not routed through read_parquet_repaired (DuckDB oracle
            # sweeps, ad-hoc reads).
            pq.write_table(
                out,
                f"{outdir}/{name}.parquet",
                row_group_size=max(512, out.num_rows // 64),
            )
            n = out.num_rows
        else:
            # sf100+: 1000 replicas would hold tens of GB in memory at
            # once — stream one replica per row group instead (identical
            # rows, identical replica order; each replica is well above
            # the 512-row floor so the layout stays splittable).
            writer = None
            n = 0
            for k in range(factor):
                rep = fn(src, k)
                if writer is None:
                    writer = pq.ParquetWriter(
                        f"{outdir}/{name}.parquet", rep.schema
                    )
                writer.write_table(rep, row_group_size=rep.num_rows)
                n += rep.num_rows
            writer.close()
        print(f"{outdir}/{name}.parquet rows={n}")


def main() -> None:
    outroot = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/benchdata"
    sizes = {"sf1": 10, "sf10": 100, "sf100": 1000}
    unknown = [a for a in sys.argv[2:] if a not in sizes]
    if unknown:
        # fail LOUDLY: a typo'd size silently falling back to the
        # default set would build the wrong datasets after minutes of
        # work (same convention as bench.py's unknown-name assert)
        raise SystemExit(
            f"unknown size args {unknown}; choose from {sorted(sizes)}"
        )
    wanted = sys.argv[2:] or ["sf1", "sf10"]
    for sf in wanted:
        upscale(os.path.join(outroot, sf), sizes[sf])


if __name__ == "__main__":
    main()
