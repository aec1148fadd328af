"""Event-time windowing over transcript turns.

The reference has NO windows (SURVEY.md §2.8 — pure arrival-order
processing with `WatermarkStrategy.noWatermarks()`,
UserBehaviorClickHouseSinkJob.java:65); the north rule adds
tumbling/sliding/session windows with event-time watermarks. All three
are native Spark operators (`F.window`, `F.session_window`) — hash
aggregations with map-side partial agg; no custom state code needed.

Scale notes:
- tumbling/sliding aggregate on (window, conv_id) — the window column
  widens the key space, so zipf-skew on conv_id is diluted per window;
  AQE skew handling covers the rest (plans/skew.py for the salted
  two-phase variant used when a single conv dominates a window).
- session windows keep per-key state in streaming; batch mode compiles
  to a sort-based session assignment within each conv_id partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType


def tumbling_counts(
    turns: DataFrame, size: str = "10 minutes"
) -> DataFrame:
    """Per-conv tumbling window: turn count + text-length sum."""
    return (
        turns.groupBy(F.window("ts", size).alias("win"), "conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.length("text").cast(DecimalType(18, 2))).alias("sum_len"),
        )
        .select(
            F.unix_millis(F.col("win.start")).alias("win_start_ms"),
            F.unix_millis(F.col("win.end")).alias("win_end_ms"),
            "conv_id",
            "n_turns",
            "sum_len",
        )
    )


def sliding_counts(
    turns: DataFrame, size: str = "10 minutes", slide: str = "5 minutes"
) -> DataFrame:
    """Per-conv sliding window counts (each row lands in size/slide
    windows — Spark expands via its internal window generator, no
    explode needed in user code)."""
    return (
        turns.groupBy(F.window("ts", size, slide).alias("win"), "conv_id")
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(
            F.unix_millis(F.col("win.start")).alias("win_start_ms"),
            "conv_id",
            "n_turns",
        )
    )


def session_windows(
    turns: DataFrame, gap: str = "30 minutes"
) -> DataFrame:
    """Turn-gap sessionization per conv_id (north-rule requirement):
    a session extends while consecutive turns are ≤ gap apart; the
    session window spans [min ts, max ts + gap)."""
    return (
        turns.groupBy(F.session_window("ts", gap).alias("win"), "conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.min("turn_idx").alias("first_turn"),
            F.max("turn_idx").alias("last_turn"),
        )
        .select(
            F.unix_millis(F.col("win.start")).alias("sess_start_ms"),
            F.unix_millis(F.col("win.end")).alias("sess_end_ms"),
            "conv_id",
            "n_turns",
            "first_turn",
            "last_turn",
        )
    )
