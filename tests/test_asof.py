"""Backward as-of join semantics (operators/joins.py:asof_join_backward).
Cross-engine parity vs DuckDB's native ASOF JOIN is covered by
test_oracle_parity[join_asof_prev_user]."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from flink_cdc_mysql_sink_to_mysql_spark.operators import joins

T0 = dt.datetime(2024, 1, 1)


def df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def ts(minute):
    return T0 + dt.timedelta(minutes=minute)


def asof(spark, left_rows, right_rows, inclusive=True):
    left = df(spark, left_rows, "k string, ts timestamp, lid int")
    right = df(spark, right_rows, "k string, ts timestamp, rid int")
    out = joins.asof_join_backward(
        left, right, key="k", left_ts="ts", right_ts="ts",
        payload=["rid"], inclusive=inclusive,
    )
    return {r.lid: (r.matched.rid if r.matched else None) for r in out.collect()}


def test_backward_picks_latest_at_or_before(spark):
    got = asof(
        spark,
        [("a", ts(5), 1), ("a", ts(9), 2), ("a", ts(2), 3)],
        [("a", ts(1), 10), ("a", ts(4), 11), ("a", ts(7), 12)],
    )
    assert got == {1: 11, 2: 12, 3: 10}


def test_inclusive_vs_strict_at_equal_ts(spark):
    l = [("a", ts(5), 1)]
    r = [("a", ts(5), 10), ("a", ts(3), 9)]
    assert asof(spark, l, r, inclusive=True) == {1: 10}
    assert asof(spark, l, r, inclusive=False) == {1: 9}


def test_unmatched_left_gets_null(spark):
    got = asof(spark, [("a", ts(0), 1), ("b", ts(5), 2)], [("a", ts(3), 10)])
    assert got == {1: None, 2: None}


def test_right_ts_ties_reduce_to_max_payload(spark):
    got = asof(
        spark,
        [("a", ts(6), 1)],
        [("a", ts(4), 7), ("a", ts(4), 12), ("a", ts(4), 9)],
    )
    assert got == {1: 12}


def test_keys_do_not_leak_across_partitions(spark):
    got = asof(
        spark,
        [("a", ts(9), 1), ("b", ts(9), 2)],
        [("a", ts(1), 10), ("b", ts(8), 20)],
    )
    assert got == {1: 10, 2: 20}


def test_asof_prev_user_gap_and_unmatched_convention(spark):
    turns = df(
        spark,
        [
            ("c1", 0, "user", ts(0)),
            ("c1", 1, "assistant", ts(3)),
            ("c1", 2, "assistant", ts(4)),
            ("c2", 0, "assistant", ts(1)),  # no user before → -1/-1
        ],
        "conv_id string, turn_idx int, role string, ts timestamp",
    ).select("*", F.lit("t").alias("text"), F.lit(None).cast("string").alias("tool"))
    out = {r.a_idx if r.conv_id == "c1" else "c2": (r.u_idx, r.gap_ms)
           for r in joins.asof_prev_user(turns).collect()}
    assert out[1] == (0, 3 * 60_000)
    assert out[2] == (0, 4 * 60_000)
    assert out["c2"] == (-1, -1)


def test_asof_null_right_ts_never_matches(spark):
    """A right row with NULL ts must not match anything: NULLs sort
    first in the window pass and would otherwise be carried forward by
    last(ignorenulls) — diverging from ASOF semantics and the DuckDB
    oracle's `ON l.ts >= r.ts` (NULL comparison rejects the row)."""
    import datetime as dt

    from flink_cdc_mysql_sink_to_mysql_spark.operators.joins import (
        asof_join_backward,
    )

    t = dt.datetime(2024, 1, 1, 0, 10)
    left = spark.createDataFrame(
        [("k", t)], "key string, lts timestamp"
    )
    right = spark.createDataFrame(
        [("k", None, 7)], "key string, rts timestamp, v int"
    )
    out = asof_join_backward(
        left, right, key="key", left_ts="lts", right_ts="rts", payload=["v"]
    ).collect()
    assert len(out) == 1 and out[0]["matched"] is None
