"""Conversation-level curation signals over agent transcripts.

Document-level quality filters (functions/text.py) treat each text blob
independently; transcript training data is curated at the CONVERSATION
grain — a conversation is kept or dropped whole, so the signals that
matter are structural: role balance, turn-length profile, tool usage,
and degenerate shapes (assistant-only monologues, single-turn stubs,
conversations that are all tool noise).

Per conversation:

- ``n_turns`` / ``n_user`` / ``n_assistant`` / ``n_tool``;
- ``user_share_permille`` — user turns per 1000 turns (role balance);
- ``avg_turn_chars`` — floor(total_chars / n_turns);
- ``ends_with_assistant`` — 1 when the maximal-turn_idx row is an
  assistant turn (a complete exchange; truncated conversations fail);
- ``keep`` — the composed gate: ≥2 turns, has a user turn, has an
  assistant turn, avg turn length in [10, 10_000], ends on assistant.

Scale shape: ONE hash aggregation on conv_id (max_by for the terminal
role — partial+final agg, no window, no sort). All outputs integers —
cross-engine exact. The keep thresholds are the tunable knobs a real
pipeline sweeps; the gate composes with sft_examples (curate first,
extract second).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MIN_TURNS = 2
MIN_AVG_CHARS = 10
MAX_AVG_CHARS = 10_000


def conversation_quality(turns: DataFrame) -> DataFrame:
    """Per-conv structural quality signals + keep gate (see module doc)."""
    agg = turns.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_turns"),
        F.sum((F.col("role") == "user").cast("int")).cast("int").alias("n_user"),
        F.sum((F.col("role") == "assistant").cast("int"))
        .cast("int")
        .alias("n_assistant"),
        F.sum((F.col("role") == "tool").cast("int")).cast("int").alias("n_tool"),
        F.sum(F.length("text")).alias("total_chars"),
        F.max_by("role", "turn_idx").alias("last_role"),
    )
    keep = (
        (F.col("n_turns") >= MIN_TURNS)
        & (F.col("n_user") > 0)
        & (F.col("n_assistant") > 0)
        & (F.col("avg_turn_chars") >= MIN_AVG_CHARS)
        & (F.col("avg_turn_chars") <= MAX_AVG_CHARS)
        & (F.col("ends_with_assistant") == 1)
    )
    return agg.select(
        "conv_id",
        "n_turns",
        "n_user",
        "n_assistant",
        "n_tool",
        # ×1000 in BIGINT: ANSI mode would overflow int32 on 2M+-turn
        # conversations (same fix as functions/text.py:_permille)
        F.floor(F.col("n_user").cast("long") * 1000 / F.col("n_turns"))
        .cast("int")
        .alias("user_share_permille"),
        F.floor(F.col("total_chars") / F.col("n_turns"))
        .cast("int")
        .alias("avg_turn_chars"),
        (F.col("last_role") == "assistant").cast("int").alias("ends_with_assistant"),
    ).select(
        "*",
        keep.cast("int").alias("keep"),
    )


def conversation_quality_sql(rel: str) -> str:
    """DuckDB SQL computing exactly :func:`conversation_quality`."""
    return f"""
    WITH agg AS (
      SELECT conv_id,
             CAST(count(*) AS INTEGER) AS n_turns,
             CAST(sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS INTEGER)
               AS n_user,
             CAST(sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)
                  AS INTEGER) AS n_assistant,
             CAST(sum(CASE WHEN role = 'tool' THEN 1 ELSE 0 END) AS INTEGER)
               AS n_tool,
             sum(length(text)) AS total_chars,
             max_by(role, turn_idx) AS last_role
      FROM ({rel}) GROUP BY conv_id
    ),
    sig AS (
      SELECT conv_id, n_turns, n_user, n_assistant, n_tool,
             CAST(floor(n_user * 1000.0 / n_turns) AS INTEGER)
               AS user_share_permille,
             CAST(floor(total_chars * 1.0 / n_turns) AS INTEGER)
               AS avg_turn_chars,
             CAST(last_role = 'assistant' AS INTEGER) AS ends_with_assistant
      FROM agg
    )
    SELECT *,
           CAST(n_turns >= {MIN_TURNS} AND n_user > 0 AND n_assistant > 0
                AND avg_turn_chars BETWEEN {MIN_AVG_CHARS} AND {MAX_AVG_CHARS}
                AND ends_with_assistant = 1 AS INTEGER) AS keep
    FROM sig
    """
