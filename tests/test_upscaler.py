"""Invariants of tools/upscale_bench_data.py — the generator of the
sf1/sf10 bench tables. The scale numbers in BENCH/BASELINE.md are only
meaningful if replication preserves within-replica structure exactly
(clean K× corpus growth) without manufacturing cross-replica artifacts;
these tests pin that contract on tiny in-memory tables (no Spark)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from tools.upscale_bench_data import (
    _STOP_UNION,
    _documents_replica,
    _embeddings_replica,
    _events_replica,
)


def test_documents_suffix_preserves_stopwords_and_injectivity():
    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(
                ["the cat sat on the mat", "el gato y the dog"], pa.string()
            ),
            "n_chars": pa.array([22, 17], pa.int64()),
        }
    )
    r = _documents_replica(t, 3)
    out = r["text"].to_pylist()
    # stopwords keep their surface form; other tokens gain r3
    assert out[0] == "the catr3 satr3 onr3 the matr3"
    assert out[1] == "el gator3 y the dogr3"
    # lang-ID inputs identical: per-doc stopword counts unchanged
    for before, after in zip(t["text"].to_pylist(), out):
        for w in _STOP_UNION:
            assert before.split().count(w) == after.split().count(w)
    # word map injective within the replica: distinct words stay distinct
    words_in = t["text"].to_pylist()[1].split()
    words_out = out[1].split()
    mapping = dict(zip(words_in, words_out))
    assert len(set(mapping.values())) == len(set(words_in))
    # n_chars recomputed
    assert r["n_chars"].to_pylist() == [len(out[0]), len(out[1])]
    # replica 0 is byte-identical
    assert _documents_replica(t, 0)["text"].to_pylist() == t["text"].to_pylist()


def test_embeddings_replica_is_orthogonal_transform():
    rng = np.random.default_rng(7)
    emb = rng.standard_normal((6, 64)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(6), pa.int64()),
            "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        }
    )
    for k in (1, 5, 63, 64, 130):
        r = np.stack(_embeddings_replica(t, k)["embedding"].to_pandas().to_numpy())
        # norm-preserving (signed permutation is orthogonal)
        assert np.allclose(
            np.linalg.norm(r, axis=1), np.linalg.norm(emb, axis=1), rtol=1e-6
        )
        # within-replica dot products BIT-EXACT in float64 terms: both
        # vectors of a pair see the same signed permutation
        assert np.allclose(r[0] @ r[1], emb[0] @ emb[1], rtol=1e-5)
        # deterministic: same k → same bytes
        r2 = np.stack(
            _embeddings_replica(t, k)["embedding"].to_pandas().to_numpy()
        )
        assert (r == r2).all()
    # distinct replicas are distinct transforms
    r1 = np.stack(_embeddings_replica(t, 1)["embedding"].to_pandas().to_numpy())
    r2 = np.stack(_embeddings_replica(t, 2)["embedding"].to_pandas().to_numpy())
    assert not (r1 == r2).all()


def test_events_replica_props_stays_valid_json_even_nested():
    import json

    t = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "user_id": pa.array([2], pa.int64()),
            "props": pa.array(['{"a": {"b": 1}}'], pa.string()),
        }
    )
    r = _events_replica(t, 4)
    out = r["props"].to_pylist()[0]
    assert json.loads(out) == {"a": {"b": 1}, "r": 4}
    assert r["event_id"].to_pylist() == [1 + 4 * 100_000]
    assert r["user_id"].to_pylist() == [2 + 4 * 1_500]


def test_streamed_writer_rows_identical_to_concat(tmp_path):
    """The sf100 streaming writer (one replica per row group) must
    produce byte-identical ROWS to the in-memory concat path — only the
    parquet layout may differ."""
    import pyarrow.parquet as pq

    from tools.upscale_bench_data import upscale

    a, b = tmp_path / "concat", tmp_path / "stream"
    upscale(str(a), 2, stream=False)
    upscale(str(b), 2, stream=True)
    for name in ("events", "documents", "embeddings"):
        ta = pq.read_table(a / f"{name}.parquet")
        tb = pq.read_table(b / f"{name}.parquet")
        assert ta.num_rows == tb.num_rows
        assert ta.schema.equals(tb.schema)
        assert ta.equals(tb), name
