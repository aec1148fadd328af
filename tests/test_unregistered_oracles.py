"""Oracle-grade coverage for queries NOT in the 50-slot driver registry.

The driver checks at most 50 queries (CORRECTNESS_r02 recorded exactly
the first 50 of 51 registered, in registration order), so three
same-oracle/parameter twins were deregistered in round 3 to make room
for window_late_data and text_rolling_fp_cp. This module keeps each of
them pinned against the SAME DuckDB oracle locally, so deregistration
never weakens their correctness guarantee:

- turn_events_pandas_salted  (pre-salted shuffle twin of turn_events_pandas)
- ann_ivf_topk_nprobe2       (nprobe=2 parameter variant of ann_ivf_topk)
- dedup_simhash              (signature intermediate of dedup_simhash_pairs)

plus the round-3 extension operators added after the registry filled:

- dedup_substring            (word-level exact substring containment;
                              O(n²) DuckDB ground truth also proves the
                              anchor candidate set lossless)
- vocab_rank_quality         (unigram-LM-proxy rank quality)
- dedup_span                 (corpus-wide duplicate-span removal with
                              document rewrite, ExactSubstr-style)
- dedup_semantic             (SemDeDup: cluster-scoped embedding
                              near-dup keep-first removal)
- cohort_exist_adaptive      (hot-key-only selective salting, same
                              oracle as cohort_exist — plans/skew.py
                              defense #4)
- search_live_state          (semantic search over the materialized
                              CDC state: deterministic cross-engine
                              embedder + broadcast top-k cosine —
                              operators/semsearch.py)
- search_index_pruned        (IVF-pruned variant: cell-partitioned
                              index vs a corpus-sample codebook,
                              nprobe-pruned scoring)
- abandoned_conversations    (batch twin of the event-time-TIMER CEP
                              op — gap-sessionize + final-watermark
                              cutoff; streaming ≡ twin pinned in
                              tests/test_streaming_ops.py)
"""

from __future__ import annotations

import duckdb
import pytest

from flink_cdc_mysql_sink_to_mysql_spark import entry_queries as eq
from flink_cdc_mysql_sink_to_mysql_spark.functions import text as textfn
from flink_cdc_mysql_sink_to_mysql_spark.operators import (
    dedup,
    history,
    similarity,
)
from tests.conftest import SF_CORRECT, register_views
from tests.util import assert_same


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    register_views(con, SF_CORRECT)
    return con


CASES = [
    (
        "turn_events_pandas_salted",
        eq.q_turn_events_pandas_salted,
        lambda: eq.TURN_EVENTS_ORACLE,
    ),
    (
        "ann_ivf_topk_nprobe2",
        eq.q_ann_ivf_topk_nprobe2,
        lambda: similarity.ivf_topk_sql("embeddings", nprobe=2),
    ),
    (
        "dedup_simhash",
        eq.q_dedup_simhash,
        lambda: dedup.simhash_sql("documents"),
    ),
    (
        "dedup_substring",
        eq.q_dedup_substring,
        lambda: dedup.substring_containment_sql("documents"),
    ),
    (
        "vocab_rank_quality",
        eq.q_vocab_rank_quality,
        lambda: textfn.vocab_rank_quality_sql("documents"),
    ),
    (
        "dedup_span",
        eq.q_dedup_span,
        lambda: dedup.span_dedup_sql("documents"),
    ),
    (
        "dedup_semantic",
        eq.q_dedup_semantic,
        lambda: similarity.semantic_dedup_sql("embeddings"),
    ),
    (
        "scd2_history",
        eq.q_scd2_history,
        lambda: eq.SCD2_ORACLE,
    ),
    (
        "scd2_asof",
        eq.q_scd2_asof,
        lambda: history.asof_snapshot_sql(eq.SCD2_ORACLE, eq.ASOF_SEQ),
    ),
    (
        "edit_churn",
        eq.q_edit_churn,
        lambda: history.edit_churn_sql(eq.MYSQL_CHANGELOG_SQL),
    ),
    (
        "preference_pairs",
        eq.q_preference_pairs,
        lambda: history.preference_pairs_sql(
            eq.MYSQL_CHANGELOG_SQL, eq.MONGO_CHANGELOG_SQL
        ),
    ),
    (
        "ann_pq_topk",
        eq.q_ann_pq_topk,
        lambda: similarity.pq_topk_sql("embeddings"),
    ),
    (
        "cohort_exist_adaptive",
        eq.q_cohort_exist_adaptive,
        lambda: eq.COHORT_EXIST_ORACLE,
    ),
    (
        "cohort_exist_cube",
        eq.q_cohort_exist_cube,
        lambda: eq.COHORT_EXIST_ORACLE,
    ),
    (
        "near_dups_live_state",
        eq.q_near_dups_live_state,
        lambda: eq.near_dups_live_oracle(),
    ),
    (
        "search_live_state",
        eq.q_search_live_state,
        lambda: __import__(
            "flink_cdc_mysql_sink_to_mysql_spark.operators.semsearch",
            fromlist=["search_live_state_sql"],
        ).search_live_state_sql(
            f"SELECT conv_id, turn_idx, text FROM ({eq.CDC_APPLY_ORACLE})"
        ),
    ),
    (
        "abandoned_conversations",
        eq.q_abandoned_conversations,
        lambda: eq.abandoned_conversations_oracle(),
    ),
    (
        "search_index_pruned",
        eq.q_search_index_pruned,
        lambda: __import__(
            "flink_cdc_mysql_sink_to_mysql_spark.operators.semsearch",
            fromlist=["search_index_pruned_sql"],
        ).search_index_pruned_sql(
            f"SELECT conv_id, turn_idx, text FROM ({eq.CDC_APPLY_ORACLE})"
        ),
    ),
]


@pytest.mark.parametrize("name,fn,oracle", CASES, ids=[c[0] for c in CASES])
def test_unregistered_query_matches_oracle(spark, duck, name, fn, oracle):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    sdf = fn(spark, SF_CORRECT)
    ddf = duck.execute(oracle()).df()
    assert_same(sdf, ddf, name)


def test_window_late_data_is_nontrivial(spark):
    """The late-data query must actually exercise the drop path: the
    deterministic 2 h delayed-delivery model has to produce late rows
    (otherwise the oracle match would be vacuous)."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    out = eq.q_window_late_data(spark, SF_CORRECT)
    agg = out.agg(
        F.sum("n_late").alias("late"), F.sum("n_on_time").alias("ok")
    ).first()
    assert agg["late"] > 0 and agg["ok"] > 0
    # delayed rows are ~20% of the feed; drops must be a plausible share
    assert agg["late"] < agg["ok"]
