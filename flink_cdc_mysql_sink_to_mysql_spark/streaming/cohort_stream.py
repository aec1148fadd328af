"""Continuously-maintained cohorts (streaming form of reference job 3).

The reference evaluates cohort rules as one-shot pull queries against
the sink table (`UserGroupClickHouseJob.java:83-96`). Here the rule's
aggregates (SUM/COUNT/MAX of the turn metric per conv_id) are
maintained INCREMENTALLY by a Structured Streaming update-mode
aggregation over the derived event stream: each micro-batch emits only
the conversations whose stats changed; foreachBatch appends them with
the epoch id, forming a stats changelog whose last-writer-wins
materialization is the current cohort-stats table. Membership is then a
filter (the HAVING conjuncts) over current stats — re-evaluated at any
time without rescanning history.

Scale: streaming state = one row of 3 numbers per conv_id (bounded by
|conversations|, not turns); the changelog materialization reuses the
same LWW shape as the CDC apply. At 10^12 turns this is THE way to keep
cohorts fresh — the reference's pull query would rescan the sink table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import cdc, cohort
from .pipeline import envelope_stream


def cohort_stats_stream(
    spark: SparkSession,
    spool_dir: str,
    rule: cohort.CohortRule,
    now: str,
    workdir: str,
) -> str:
    """Run the incremental stats aggregation over the envelope spool.

    Returns the stats-changelog directory (parquet, one file set per
    epoch with an ``_epoch`` column).
    """
    delta_dir = os.path.join(workdir, "stats_delta")
    ckpt = os.path.join(workdir, "ck")

    env = envelope_stream(spark, spool_dir)
    events = cdc.derive_turn_events(env)
    df = events
    kind = cohort.TARGET_TO_KIND.get(rule.target)
    if kind is not None:  # unmapped-target quirk: no filter
        df = df.where(F.col("event_kind") == kind)
    df = df.where(F.col("ts") >= cohort.cutoff_expr(now, rule.value_days))

    stats = df.groupBy("conv_id").agg(
        F.sum("metric").alias("sum_metric"),
        F.count(F.lit(1)).alias("cnt"),
        F.max("metric").alias("max_metric"),
    )

    def _append(batch: DataFrame, epoch_id: int) -> None:
        batch.withColumn("_epoch", F.lit(int(epoch_id))).write.mode(
            "append"
        ).parquet(delta_dir)

    q = (
        stats.writeStream.outputMode("update")
        .foreachBatch(_append)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return delta_dir


def current_stats(spark: SparkSession, delta_dir: str) -> DataFrame:
    """LWW-materialize the stats changelog: last emission per conv_id."""
    delta = spark.read.parquet(delta_dir)
    return (
        delta.groupBy("conv_id")
        .agg(
            F.max_by(
                F.struct("sum_metric", "cnt", "max_metric"), F.col("_epoch")
            ).alias("w")
        )
        .select("conv_id", "w.*")
    )


def cohort_members(
    spark: SparkSession, delta_dir: str, rule: cohort.CohortRule
) -> DataFrame:
    """HAVING-filter the current stats → cohort conv_ids."""
    stats = current_stats(spark, delta_dir)
    if not rule.sub_params:
        return stats.select("conv_id")
    col_for_dim = {
        1: F.col("sum_metric"),
        2: F.col("cnt"),
        3: F.col("max_metric"),
    }
    cond = None
    for sp in rule.sub_params:
        c = cohort._OPS[sp.operator](col_for_dim[sp.dimension], F.lit(sp.value))
        cond = c if cond is None else (cond & c)
    return stats.where(cond).select("conv_id")


# --- dynamic rules over a rule-independent cube (broadcast-state analog)


def load_rules(path: str) -> list[cohort.CohortRule]:
    """Rule file → CohortRule list. Format: a JSON array of
    ``{"target": int, "is_exist": bool, "value_days": int,
    "sub_params": [[dimension, operator, value], ...]}`` — the
    UserGroupParam/SubParam wire shape (UserGroupClickHouseJob.java:
    65-78) as data instead of code, so operators ship rule changes
    without a deploy."""
    import json

    with open(path) as f:
        specs = json.load(f)
    return [
        cohort.CohortRule(
            target=s["target"],
            is_exist=s["is_exist"],
            value_days=s["value_days"],
            sub_params=tuple(
                cohort.SubParam(*sp) for sp in s.get("sub_params", ())
            ),
        )
        for s in specs
    ]


def cube_delta_dir(workdir: str) -> str:
    return os.path.join(workdir, "cube_delta")


def members_dir(workdir: str) -> str:
    return os.path.join(workdir, "members")


def current_cube(spark: SparkSession, delta_dir: str) -> DataFrame:
    """LWW-materialize the cube changelog: the latest emission per
    (conv_id, event_kind, day) cell — same max_by shape as the CDC
    apply, keyed on the cube cell."""
    delta = spark.read.parquet(delta_dir)
    return (
        delta.groupBy("conv_id", "event_kind", "day")
        .agg(
            F.max_by(
                F.struct("sum_metric", "cnt", "max_metric"), F.col("_epoch")
            ).alias("w")
        )
        .select("conv_id", "event_kind", "day", "w.*")
    )


def run_dynamic_cohorts(
    spark: SparkSession,
    spool_dir: str,
    rules_path: str,
    workdir: str,
    now: str,
) -> dict:
    """The broadcast-state pattern, Structured-Streaming-first: maintain
    the rule-independent cube (`cohort.events_cube` keys, update-mode)
    and, per micro-batch, RELOAD the rule file and emit an epoch-keyed
    membership snapshot evaluated on the cube so far. A rule change
    lands on the next micro-batch — exactly the visibility Flink's
    broadcast control stream gives — but the heavy state (the cube) is
    rule-independent, so changing rules costs nothing: no state
    restart, no re-aggregation, no checkpoint migration.

    Exactly-once: the cube delta AND the membership snapshot for epoch
    N are idempotent epoch-keyed directory overwrites (a replayed epoch
    rewrites identical content); the checkpoint owns progress.

    Returns {"epochs": [...], "last_members": int}.
    """
    ckpt = os.path.join(workdir, "ck_dyn")
    delta_dir = cube_delta_dir(workdir)
    mdir = members_dir(workdir)
    seen: list[int] = []

    env = envelope_stream(spark, spool_dir)
    events = cdc.derive_turn_events(env)
    cube = cohort.events_cube(events)

    def _batch(batch: DataFrame, epoch_id: int) -> None:
        eid = int(epoch_id)
        batch.withColumn("_epoch", F.lit(eid)).write.mode("overwrite").parquet(
            os.path.join(delta_dir, f"epoch={eid}")
        )
        # serve-time evaluation over the cube SO FAR, with the rules as
        # they stand NOW (reloaded per batch — the broadcast-state hook)
        rules = load_rules(rules_path)
        cur = current_cube(spark, delta_dir)
        members = cur.select("conv_id").distinct()
        out = cohort.evaluate_rules_cube(cur, members, rules, now)
        out.write.mode("overwrite").parquet(os.path.join(mdir, f"epoch={eid}"))
        seen.append(eid)

    q = (
        cube.writeStream.outputMode("update")
        .foreachBatch(_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    last = read_members(spark, workdir)
    return {
        "epochs": seen,
        "last_members": last.count() if last is not None else 0,
    }


def _member_epochs(workdir: str) -> list[int]:
    mdir = members_dir(workdir)
    if not os.path.isdir(mdir):
        return []
    return sorted(
        int(n.split("=", 1)[1])
        for n in os.listdir(mdir)
        if n.startswith("epoch=")
    )


def read_members(
    spark: SparkSession, workdir: str, epoch: int | None = None
) -> DataFrame | None:
    """The membership snapshot at ``epoch`` (default: latest)."""
    epochs = _member_epochs(workdir)
    if not epochs:
        return None
    eid = epochs[-1] if epoch is None else epoch
    return spark.read.parquet(os.path.join(members_dir(workdir), f"epoch={eid}"))


def membership_transitions(spark: SparkSession, workdir: str) -> DataFrame:
    """ENTER/EXIT changelog across the recorded snapshots: for every
    (rule_id, conv_id) that appears in, or disappears from, consecutive
    epochs, one row (epoch, rule_id, conv_id, change ∈ {enter, exit}).
    Computed AT READ TIME from the idempotent snapshots — the stream
    never carries cross-epoch state, so replays cannot corrupt the
    transition history (recomputing it is free and deterministic)."""
    epochs = _member_epochs(workdir)
    frames = [
        spark.read.parquet(os.path.join(members_dir(workdir), f"epoch={e}"))
        .select(F.lit(e).alias("epoch"), "rule_id", "conv_id")
        for e in epochs
    ]
    from functools import reduce as _reduce

    snaps = _reduce(lambda a, b: a.unionByName(b), frames)
    # membership interval per key → enter at first epoch present, exit
    # at the epoch AFTER the last one present (if any snapshot follows)
    epochs_df = F.array(*[F.lit(e) for e in epochs])
    spans = snaps.groupBy("rule_id", "conv_id").agg(
        F.collect_set("epoch").alias("present")
    )
    # one pass over each key's presence set vs the global epoch list:
    # a key enters at e if present(e) and not present(prev(e)); exits
    # at e if not present(e) and present(prev(e))
    exploded = spans.select(
        "rule_id",
        "conv_id",
        F.posexplode(epochs_df).alias("pos", "epoch"),
        F.col("present"),
    )
    has = F.array_contains(F.col("present"), F.col("epoch"))
    prev_e = F.element_at(epochs_df, F.col("pos"))  # 1-based = previous
    had = F.when(
        F.col("pos") > 0, F.array_contains(F.col("present"), prev_e)
    ).otherwise(F.lit(False))
    return (
        exploded.withColumn(
            "change",
            F.when(has & ~had, F.lit("enter")).when(
                ~has & had, F.lit("exit")
            ),
        )
        .where(F.col("change").isNotNull())
        .select("epoch", "rule_id", "conv_id", "change")
    )
