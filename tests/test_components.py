"""Connected-components / dup-cluster semantics (operators/components.py).
Cross-engine parity is covered by test_oracle_parity[dedup_clusters]."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_cdc_mysql_sink_to_mysql_spark.operators import components


def pairs_df(spark, pairs):
    return spark.createDataFrame(pairs, "doc_a long, doc_b long")


def cc_map(df):
    return {r.node: r.component for r in df.collect()}


def test_cc_basic_clusters(spark):
    # {1,2,3} via chain, {10,11}, plus an isolated edge pair {20,21}
    got = cc_map(
        components.connected_components(
            pairs_df(spark, [(1, 2), (2, 3), (10, 11), (21, 20)])
        )
    )
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_cc_path_graph_converges_fast(spark):
    # worst case for label propagation: a 64-node path — star rounds
    # must converge long before MAX_ROUNDS (O(log² n), not O(n))
    n = 64
    got = cc_map(
        components.connected_components(
            pairs_df(spark, [(i, i + 1) for i in range(n)]), max_rounds=15
        )
    )
    assert got == {i: 0 for i in range(n + 1)}


def test_cc_order_invariant_and_duplicate_edges(spark):
    e1 = pairs_df(spark, [(5, 3), (3, 5), (3, 1), (5, 1), (1, 3)])
    assert cc_map(components.connected_components(e1)) == {1: 1, 3: 1, 5: 1}


def test_cc_no_convergence_raises(spark):
    with pytest.raises(RuntimeError):
        components.connected_components(
            pairs_df(spark, [(i, i + 1) for i in range(64)]), max_rounds=1
        )


def test_dup_clusters_keeps_singletons_and_canonicals(spark):
    docs = spark.createDataFrame(
        [(i,) for i in range(6)], "doc_id long"
    )
    out = components.dup_clusters(docs, pairs_df(spark, [(0, 4), (4, 2)]))
    rows = {r.doc_id: (r.cluster_id, r.is_canonical) for r in out.collect()}
    assert rows == {
        0: (0, True),
        2: (0, False),
        4: (0, False),
        1: (1, True),  # singleton: own cluster, canonical
        3: (3, True),
        5: (5, True),
    }
    # exactly one canonical per cluster
    per = (
        out.groupBy("cluster_id")
        .agg(F.sum(F.col("is_canonical").cast("int")).alias("n"))
        .collect()
    )
    assert all(r.n == 1 for r in per)
