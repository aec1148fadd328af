"""Stream-stream / turn-pairing joins.

North rule: join user-turns to assistant/tool-turns on conv_id with an
event-time bound. The reference only has a union (U1); this is the new
stateful capability. Batch form below (oracle-checkable); streaming
form in streaming/pipeline.py uses the same plan with watermarks on
both sides so state is evictable.

Scale: an equi-join on conv_id with a range predicate on ts — Spark
plans a sort-merge join on conv_id partitions; the time bound prunes
state in streaming. Hot conv_ids are handled by AQE skew-join splitting
(plans/skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def user_turn_responses(
    turns: DataFrame,
    max_delay: str = "INTERVAL 30 MINUTES",
    respond_roles: tuple[str, ...] = ("assistant", "tool"),
) -> DataFrame:
    """Pair each user turn with every assistant/tool turn in the same
    conversation within (u.ts, u.ts + max_delay]."""
    u = turns.where(F.col("role") == "user").select(
        F.col("conv_id").alias("u_conv"),
        F.col("turn_idx").alias("u_idx"),
        F.col("ts").alias("u_ts"),
    )
    a = turns.where(F.col("role").isin(*respond_roles)).select(
        F.col("conv_id").alias("a_conv"),
        F.col("turn_idx").alias("a_idx"),
        F.col("role").alias("a_role"),
        F.col("ts").alias("a_ts"),
    )
    cond = (
        (u["u_conv"] == a["a_conv"])
        & (a["a_ts"] > u["u_ts"])
        & (a["a_ts"] <= u["u_ts"] + F.expr(max_delay))
    )
    return u.join(a, cond, "inner").select(
        F.col("u_conv").alias("conv_id"),
        "u_idx",
        "a_idx",
        "a_role",
        (F.unix_millis("a_ts") - F.unix_millis("u_ts")).alias("latency_ms"),
    )


def first_response(turns: DataFrame, max_delay: str = "INTERVAL 30 MINUTES") -> DataFrame:
    """The FIRST responding turn per user turn (min latency, tie-broken
    by smallest responder turn_idx) — one keyed min_by aggregation, no
    window sort."""
    pairs = user_turn_responses(turns, max_delay)
    pick = F.struct("latency_ms", "a_idx", "a_role")
    return (
        pairs.groupBy("conv_id", "u_idx")
        .agg(F.min(pick).alias("w"))
        .select(
            "conv_id",
            "u_idx",
            F.col("w.a_idx").alias("a_idx"),
            F.col("w.a_role").alias("a_role"),
            F.col("w.latency_ms").alias("latency_ms"),
        )
    )


def streaming_user_responses(
    user_stream: DataFrame,
    responder_stream: DataFrame,
    watermark: str = "1 hour",
    max_delay: str = "INTERVAL 30 MINUTES",
) -> DataFrame:
    """Watermarked stream-stream inner join (state evicted once both
    watermarks pass the time bound)."""
    u = user_stream.withWatermark("ts", watermark).select(
        F.col("conv_id").alias("u_conv"),
        F.col("turn_idx").alias("u_idx"),
        F.col("ts").alias("u_ts"),
    )
    a = responder_stream.withWatermark("ts", watermark).select(
        F.col("conv_id").alias("a_conv"),
        F.col("turn_idx").alias("a_idx"),
        F.col("role").alias("a_role"),
        F.col("ts").alias("a_ts"),
    )
    cond = (
        (u["u_conv"] == a["a_conv"])
        & (a["a_ts"] > u["u_ts"])
        & (a["a_ts"] <= u["u_ts"] + F.expr(max_delay))
    )
    return u.join(a, cond, "inner").select(
        F.col("u_conv").alias("conv_id"),
        "u_idx",
        "a_idx",
        "a_role",
        (F.unix_millis("a_ts") - F.unix_millis("u_ts")).alias("latency_ms"),
    )
