"""Agent-trace (tool-chain) metrics over conversation transcripts.

CEP-flavored batch analytics the reference cannot express at all (its
pipeline is stateless per-event routing — SURVEY.md §2.2,
UserBehaviorDebeziumDeserializer.java:64-196 has no cross-event
state): per-conversation tool-call chain structure, computed with the
gaps-and-islands pattern (consecutive-run detection via
``turn_idx - row_number()``) — the batch twin of the streaming progress
CEP operator in streaming/stateful.py.

Metrics per conversation:

- ``n_turns`` / ``n_tool_calls`` — size and tool-call volume;
- ``n_tool_chains`` / ``max_tool_chain`` — number and longest length of
  *consecutive* tool-turn runs (an agent "acting without user input");
- ``max_same_tool_run`` — longest consecutive repetition of ONE tool,
  the classic stuck-agent signature;
- ``tool_loop`` — 1 when ``max_same_tool_run ≥ LOOP_THRESHOLD``.

Scale shape: every window and every groupBy below partitions on
``conv_id`` (or a superset of it), so the whole computation is ONE hash
exchange of (conv_id, turn_idx, role, tool) — the windows and the
downstream aggregations reuse the same partitioning, and the three
per-conv aggregates join shuffle-free on the already-partitioned key.
At 10^12 turns the input would be bucketed by conv_id (same layout the
CDC sink writes), making the exchange itself vanish. All outputs are
integers — bit-exact cross-engine (see functions/text.py design rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

LOOP_THRESHOLD = 3


def trace_metrics(turns: DataFrame, loop_threshold: int = LOOP_THRESHOLD) -> DataFrame:
    """Per-conversation tool-chain metrics (see module doc).

    ``turns``: the transcript table (conv_id, turn_idx, role, tool, …);
    turn_idx is unique within a conversation, so the window below is
    deterministic.

    Single-exchange formulation: ONE window pass (partitionBy conv_id)
    assigns chain/run ids via running sums of boundary indicators; every
    downstream groupBy keys on conv_id or a superset of it, so Spark
    re-uses the window's hash partitioning — the whole operator is one
    shuffle of (conv_id, turn_idx, role, tool) however large the input.
    (The first, branchy gaps-and-islands draft cost 6 exchanges; plan
    asserted in tests/test_plans.py.)
    """
    base = turns.select("conv_id", "turn_idx", "role", "tool")

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    run_frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    is_tool = F.col("role") == "tool"
    prev_role = F.lag("role").over(w)
    prev_tool = F.lag("tool").over(w)
    # a tool turn opens a new chain when the previous turn wasn't a tool
    # turn (or doesn't exist); a new same-tool run additionally starts
    # when the tool changes mid-chain.
    chain_start = is_tool & (prev_role.isNull() | (prev_role != "tool"))
    run_start = is_tool & (chain_start | ~F.col("tool").eqNullSafe(prev_tool))
    ids = base.select(
        "conv_id",
        is_tool.alias("is_tool"),
        F.sum(chain_start.cast("int")).over(run_frame).alias("chain_id"),
        F.sum(run_start.cast("int")).over(run_frame).alias("run_id"),
    )

    # (conv, is_tool, chain, run) → run lengths; non-tool rows ride along
    # so turn totals come out of the same single-exchange pipeline.
    per_run = ids.groupBy("conv_id", "is_tool", "chain_id", "run_id").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    per_chain = per_run.groupBy("conv_id", "is_tool", "chain_id").agg(
        F.sum("run_len").alias("chain_len"),
        F.max("run_len").alias("max_run_len"),
    )
    agg = per_chain.groupBy("conv_id").agg(
        F.sum("chain_len").cast("int").alias("n_turns"),
        F.sum(F.when(F.col("is_tool"), F.col("chain_len")).otherwise(0))
        .cast("int")
        .alias("n_tool_calls"),
        F.sum(F.col("is_tool").cast("int")).cast("int").alias("n_tool_chains"),
        F.max(F.when(F.col("is_tool"), F.col("chain_len")).otherwise(0))
        .cast("int")
        .alias("max_tool_chain"),
        F.max(F.when(F.col("is_tool"), F.col("max_run_len")).otherwise(0))
        .cast("int")
        .alias("max_same_tool_run"),
    )
    return agg.select(
        "conv_id",
        "n_turns",
        "n_tool_calls",
        "n_tool_chains",
        "max_tool_chain",
        "max_same_tool_run",
        (F.col("max_same_tool_run") >= loop_threshold).cast("int").alias("tool_loop"),
    )


def trace_metrics_sql(rel: str, loop_threshold: int = LOOP_THRESHOLD) -> str:
    """DuckDB SQL computing exactly :func:`trace_metrics` over ``rel``
    (a relation with conv_id, turn_idx, role, tool columns)."""
    return f"""
    WITH base AS (SELECT conv_id, turn_idx, role, tool FROM ({rel})),
    totals AS (
      SELECT conv_id,
             CAST(count(*) AS INTEGER) AS n_turns,
             CAST(sum(CASE WHEN role = 'tool' THEN 1 ELSE 0 END) AS INTEGER)
               AS n_tool_calls
      FROM base GROUP BY conv_id
    ),
    tool_turns AS (SELECT * FROM base WHERE role = 'tool'),
    chains AS (
      SELECT conv_id,
             CAST(count(*) AS INTEGER) AS n_tool_chains,
             CAST(max(chain_len) AS INTEGER) AS max_tool_chain
      FROM (
        SELECT conv_id, island, count(*) AS chain_len
        FROM (
          SELECT conv_id,
                 turn_idx - row_number()
                   OVER (PARTITION BY conv_id ORDER BY turn_idx) AS island
          FROM tool_turns
        ) GROUP BY conv_id, island
      ) GROUP BY conv_id
    ),
    same_tool AS (
      SELECT conv_id, CAST(max(run_len) AS INTEGER) AS max_same_tool_run
      FROM (
        SELECT conv_id, tool, island, count(*) AS run_len
        FROM (
          SELECT conv_id, tool,
                 turn_idx - row_number()
                   OVER (PARTITION BY conv_id, tool ORDER BY turn_idx) AS island
          FROM tool_turns
        ) GROUP BY conv_id, tool, island
      ) GROUP BY conv_id
    )
    SELECT t.conv_id, t.n_turns, t.n_tool_calls,
           COALESCE(c.n_tool_chains, 0) AS n_tool_chains,
           COALESCE(c.max_tool_chain, 0) AS max_tool_chain,
           COALESCE(s.max_same_tool_run, 0) AS max_same_tool_run,
           CAST(COALESCE(s.max_same_tool_run, 0) >= {loop_threshold} AS INTEGER)
             AS tool_loop
    FROM totals t
    LEFT JOIN chains c USING (conv_id)
    LEFT JOIN same_tool s USING (conv_id)
    """
