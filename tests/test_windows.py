"""Window-operator semantics pins: session gap boundary, sliding
membership count."""

from __future__ import annotations

import datetime as dt

from flink_cdc_mysql_sink_to_mysql_spark.operators import windows

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
SCHEMA = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"


def turns_df(spark, minutes, cid="c"):
    rows = [
        (cid, i, "user", "t", None, T0 + dt.timedelta(minutes=m))
        for i, m in enumerate(minutes)
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_session_gap_boundary(spark):
    # gap = 30min; Spark merges adjacent [ts, ts+gap) ranges, so a turn
    # at EXACTLY prev_ts + gap still merges (pinned below)
    df = turns_df(spark, [0, 29, 59, 89.0001])
    out = windows.session_windows(df, gap="30 minutes").collect()
    # 0→29 diff 29 (merge), 29→59 diff == gap (still MERGES — Spark
    # merges adjacent [ts, ts+gap) ranges), 59→89.0001 diff > gap (new)
    assert sorted(r["n_turns"] for r in out) == [1, 3]


def test_sliding_each_row_in_two_windows(spark):
    df = turns_df(spark, [7])
    out = windows.sliding_counts(df).collect()
    starts = sorted(r["win_start_ms"] for r in out)
    e = int((T0 + dt.timedelta(minutes=7)).timestamp() * 1000)
    assert len(starts) == 2
    for s in starts:
        assert s <= e < s + 600000


def test_tumbling_alignment(spark):
    df = turns_df(spark, [0, 9.99, 10])
    out = windows.tumbling_counts(df).collect()
    assert sorted(r["n_turns"] for r in out) == [1, 2]
