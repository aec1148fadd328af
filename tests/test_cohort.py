"""Cohort rule-compiler unit tests, incl. the reference's verbatim
fixture rules (UserGroupClickHouseJob.java:65-78) and the
unmapped-target⇒no-filter quirk (UserGroupMapper.xml:8-27)."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from pyspark.sql.types import (
    DecimalType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from flink_cdc_mysql_sink_to_mysql_spark.operators import cohort

EVENTS = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("event_kind", IntegerType()),
        StructField("ts", TimestampType()),
        StructField("metric", DecimalType(18, 2)),
    ]
)

NOW = "2024-06-30 12:00:00"
IN_WIN = dt.datetime(2024, 6, 25)
OLD = dt.datetime(2024, 5, 1)


def ev(cid, kind, ts=IN_WIN, metric="10.00"):
    return (cid, kind, ts, Decimal(metric))


def ids(df):
    return sorted(r["conv_id"] for r in df.collect())


def test_reference_rule_1_not_exist(spark):
    # {target:0 → kind 1, is_exist:false, value:14}: members with NO
    # user_turn event in the last 14 days
    events = spark.createDataFrame(
        [ev("a", 1), ev("b", 2), ev("c", 1, ts=OLD)], EVENTS
    )
    members = spark.createDataFrame([("a",), ("b",), ("c",)], "conv_id string")
    rule = cohort.REFERENCE_RULES[0]
    out = cohort.evaluate_rule(members, events, rule, NOW)
    # a did it; b only did kind 2; c did it but outside the window
    assert ids(out) == ["b", "c"]


def test_reference_rule_2_exist_having(spark):
    # {target:1 → kind 2, exist, 30d, COUNT>=1 AND COUNT<=2 AND
    #  SUM<=100 AND MAX<=50}
    events = spark.createDataFrame(
        [
            ev("ok", 2, metric="40.00"),
            ev("ok", 2, metric="50.00"),  # count 2, sum 90, max 50 → pass
            ev("too_many", 2), ev("too_many", 2), ev("too_many", 2),
            ev("big_sum", 2, metric="60.00"), ev("big_sum", 2, metric="50.00"),
            ev("big_max", 2, metric="51.00"),
            ev("wrong_kind", 3),
        ],
        EVENTS,
    )
    members = spark.createDataFrame([], "conv_id string")
    out = cohort.evaluate_rule(members, events, cohort.REFERENCE_RULES[1], NOW)
    assert ids(out) == ["ok"]


def test_unmapped_target_matches_all_kinds(spark):
    # targets 4/5/7 have no mapping → NO kind filter (quirk R2)
    events = spark.createDataFrame([ev("a", 1), ev("b", 7), ev("c", 99)], EVENTS)
    rule = cohort.CohortRule(target=4, is_exist=True, value_days=14)
    out = cohort.exist_conv_ids(events, rule, NOW)
    assert ids(out) == ["a", "b", "c"]


def test_cutoff_is_start_of_day_minus_value_minus_1(spark):
    # cutoff = day_start(now − (v−1) days)  (UserGroupClickHouseJob.java:87)
    # NOW=2024-06-30 12:00, v=3 → cutoff 2024-06-28 00:00
    rule = cohort.CohortRule(target=0, is_exist=True, value_days=3)
    events = spark.createDataFrame(
        [
            ev("in", 1, ts=dt.datetime(2024, 6, 28, 0, 0, 0)),
            ev("out", 1, ts=dt.datetime(2024, 6, 27, 23, 59, 59)),
        ],
        EVENTS,
    )
    assert ids(cohort.exist_conv_ids(events, rule, NOW)) == ["in"]


def test_adaptive_with_precomputed_hot_feed_equals_direct(spark):
    """exist_conv_ids_adaptive(hot=...) — the ONLINE closed loop where
    the hot-key set comes from the stream's .hot/ feed instead of an
    in-session detection scan — must stay row-identical to the direct
    plan, including when the fed set is empty, wrong, or partial
    (salting is semantics-free for algebraic aggregates)."""
    from pyspark.sql import functions as F

    rule = cohort.REFERENCE_RULES[1]
    rows = (
        [ev("hot", 2, metric="40.00")] * 6
        + [ev("ok", 2, metric="40.00"), ev("ok", 2, metric="50.00")]
        + [ev("cold", 2, metric="1.00")]
    )
    events = (
        spark.createDataFrame(rows, EVENTS)
        .withColumn("seq", F.monotonically_increasing_id())
    )
    direct = ids(cohort.exist_conv_ids(events, rule, NOW))
    for hot_rows in ([], [("hot",)], [("nosuch",)], [("hot",), ("cold",)]):
        hot = spark.createDataFrame(hot_rows, "conv_id string")
        got = ids(cohort.exist_conv_ids_adaptive(events, rule, NOW, hot=hot))
        assert got == direct, hot_rows
