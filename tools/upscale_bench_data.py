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
             JSON field for k>0 so per-turn text differs per replica.
- documents: doc_id += k*5_000; every whitespace token gains suffix
             ``r{k}`` for k>0 — word-level bijection, so *within* a
             replica the shingle/Jaccard structure (incl. planted
             near-dup pairs) is preserved exactly, while cross-replica
             shingle overlap is zero. n_chars recomputed.
- embeddings: vec_id += k*2_000; vector rotated by k%64 dims and
             negated when (k//64)%2=1 — norm-preserving, within-replica
             cosine structure exact, cross-replica cosines incoherent.

No RNG, no wall clock — same bytes on every run. Remaining TPC-H dims
are copied as-is (nothing in bench reads them, but the audit tooling
expects the full table set).

Usage:  python tools/upscale_bench_data.py [outroot]
Writes  {outroot}/sf1/*.parquet and {outroot}/sf10/*.parquet
        (default outroot /root/repo/benchdata; ~0.5 GB total).
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

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
        # '{"k": 76}' -> '{"k": 76, "r": 3}' — per-replica turn text
        cols["props"] = pc.binary_join_element_wise(
            pc.utf8_rtrim(t["props"], "}"), pa.scalar(f', "r": {k}}}'), ""
        )
    return pa.table(cols)


def _documents_replica(t: pa.Table, k: int) -> pa.Table:
    import pyarrow.compute as pc

    cols = {name: t[name] for name in t.column_names}
    cols["doc_id"] = pc.add(t["doc_id"], pa.scalar(k * DOC_OFF, pa.int64()))
    if k > 0:
        txt = t["text"].to_pandas().str.replace(
            r"(\S+)", rf"\g<1>r{k}", regex=True
        )
        cols["text"] = pa.array(txt, pa.string())
        cols["n_chars"] = pa.array(txt.str.len().astype("int64"), pa.int64())
    return pa.table(cols)


def _embeddings_replica(t: pa.Table, k: int) -> pa.Table:
    import pyarrow.compute as pc

    cols = {name: t[name] for name in t.column_names}
    cols["vec_id"] = pc.add(t["vec_id"], pa.scalar(k * VEC_OFF, pa.int64()))
    if k > 0:
        emb = np.stack(t["embedding"].to_pandas().to_numpy())  # (n, 64)
        emb = np.roll(emb, k % emb.shape[1], axis=1)
        if (k // emb.shape[1]) % 2 == 1:
            emb = -emb
        cols["embedding"] = pa.array(list(emb), pa.list_(pa.float32()))
    return pa.table(cols)


_REPLICATORS = {
    "events": _events_replica,
    "documents": _documents_replica,
    "embeddings": _embeddings_replica,
}


def upscale(outdir: str, factor: int) -> None:
    os.makedirs(outdir, exist_ok=True)
    for name in COPY_TABLES:
        shutil.copyfile(
            f"{SRC}/{name}.parquet", f"{outdir}/{name}.parquet"
        )
    for name, fn in _REPLICATORS.items():
        src = pq.read_table(f"{SRC}/{name}.parquet")
        out = pa.concat_tables([fn(src, k) for k in range(factor)])
        # many row groups => splittable scan for local[32]
        pq.write_table(
            out, f"{outdir}/{name}.parquet", row_group_size=131_072
        )
        print(f"{outdir}/{name}.parquet rows={out.num_rows}")


def main() -> None:
    outroot = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/benchdata"
    for sf, factor in (("sf1", 10), ("sf10", 100)):
        upscale(os.path.join(outroot, sf), factor)


if __name__ == "__main__":
    main()
