"""Incremental view maintenance: windowed aggregates under CDC upserts.

``windowed_counts_stream`` (pipeline.py) counts EVENTS — correct for an
append-only feed, but a changelog is not append-only: an ``op='u'``
that moves a turn's ``ts`` across a window boundary must retract from
the old window and add to the new one, and an ``op='d'`` must retract
outright. Structured Streaming's windowed aggregates cannot retract in
append mode, so this module maintains the windowed view the same way
the engine maintains the transcript table: as an idempotent MERGE-style
table updated per micro-batch.

Design (the exactly-once shape that needs NO retraction arithmetic):

1. the micro-batch merges into the LWW state sink as usual;
2. the batch's touched conversations are recomputed FROM the
   post-merge state (bucket-pruned read — work ∝ batch footprint, not
   table size), producing each touched conv's complete, correct window
   rows;
3. a grouped-replace commit swaps those convs' rows in the window
   table (delete-all-rows-of-key ∪ insert-recomputed), epoch-skipped
   like the state sink.

Recompute-from-state makes every epoch idempotent by construction: a
replay re-reads the same committed state and re-derives byte-identical
window rows, so crashes between the two commits converge (pinned by
tests/test_ivm.py). Incremental ±delta arithmetic would instead have
to prove each retraction applied exactly once — strictly harder, and
the reason change-data views in lakehouse engines use this same
touched-partition recompute pattern.

Scale: per micro-batch work is (touched buckets read) + (hash agg over
touched convs' turns) + (touched buckets of the window table written).
A hot conversation bounds the recompute by its own turn count; the
window table is bucketed on conv_id exactly like the state table.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sink import LINEAGE, MergeParquetSink


@dataclass
class GroupedReplaceParquetSink(MergeParquetSink):
    """Keyed table with replace-by-group commits (same manifest /
    bucket / epoch-skip machinery as the MERGE sink; rows of one key
    always live in the key's hash bucket).

    ``replace_groups(keys, rows, epoch)``: atomically replace ALL rows
    of the given keys with the given rows (callers pass rows only for
    those keys — a key with no rows is a full delete).

    ``schema_ddl`` fixes the table's row type (reads of an empty /
    partial table need it); the default is the tumbling-window view.
    """

    #: row schema incl. the stored bucket column (field, not class
    #: constant: the session view and future per-key views differ)
    schema_ddl: str = (
        "conv_id string, win_start timestamp, win_end timestamp,"
        " n_turns long, bucket int"
    )

    @property
    def _SCHEMA(self) -> str:  # noqa: N802 (mirrors the parent constant)
        return self.schema_ddl

    def replace_groups(
        self, keys: DataFrame, rows: DataFrame, epoch_id: int
    ) -> dict:
        spark = rows.sparkSession
        t0 = time.time()
        manifest = self._load_manifest()
        if epoch_id in manifest["epochs"]:
            return {"epoch": epoch_id, "skipped": True}
        stored = manifest.get("n_buckets")
        if stored is not None and stored != self.n_buckets:
            self.n_buckets = stored
        manifest["n_buckets"] = self.n_buckets

        bucket_of = F.pmod(F.xxhash64("conv_id"), F.lit(self.n_buckets)).cast(
            "int"
        )
        keys = keys.select("conv_id").distinct().cache()
        # touched buckets come from the KEYS (a key whose recompute is
        # empty still purges its old rows)
        touched = [
            r["b"] for r in keys.select(bucket_of.alias("b")).distinct().collect()
        ]
        delta = rows.withColumn("bucket", bucket_of)

        current = self._read_buckets(spark, touched)
        if current is None:
            out = delta
        else:
            out = current.join(
                F.broadcast(keys), "conv_id", "left_anti"
            ).unionByName(delta)

        new_version = manifest["version"] + 1
        verdir = f"v{new_version}-{epoch_id}"
        out.withColumn("pb", F.col("bucket")).repartition("pb").write.partitionBy(
            "pb"
        ).mode("overwrite").parquet(os.path.join(self.root, verdir))
        # a bucket can end up empty (all its keys' windows deleted):
        # it must leave the manifest, not point at a missing pb= dir
        written = {
            name.split("=", 1)[1]
            for name in os.listdir(os.path.join(self.root, verdir))
            if name.startswith("pb=")
        }
        for b in touched:
            if str(b) in written:
                manifest["buckets"][str(b)] = f"{verdir}/pb={b}"
            else:
                manifest["buckets"].pop(str(b), None)
        keys.unpersist()

        manifest["version"] = new_version
        manifest["epochs"] = sorted(set(manifest["epochs"]) | {epoch_id})[-1000:]
        self._commit_manifest(manifest)
        lineage = {
            "epoch": int(epoch_id),
            "buckets": [int(b) for b in sorted(touched)],
            "wall_s": round(time.time() - t0, 3),
        }
        with open(os.path.join(self.root, LINEAGE), "a") as f:
            f.write(json.dumps(lineage) + "\n")
        return lineage

    def read_view(self, spark: SparkSession) -> DataFrame:
        """Current window rows (no tombstones exist in this table)."""
        return self.read(spark).drop("bucket")


def windowed_state_batch(envelopes: DataFrame, window: str = "10 minutes") -> DataFrame:
    """Batch twin / oracle: tumbling per-conv window counts over the
    fully-materialized LWW state — what the maintained view must equal
    after the stream drains, whatever the update/delete interleaving."""
    from ..operators.cdc import apply_changelog

    return _window_rows(apply_changelog(envelopes), window)


def _window_rows(live: DataFrame, window: str, slide: str | None = None) -> DataFrame:
    # with slide, F.window(ts, W, S) multi-assigns each turn to its W/S
    # covering windows — the recompute stays one hash agg per touched conv
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        live.groupBy("conv_id", win.alias("win"))
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(
            "conv_id",
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "n_turns",
        )
    )


def _tumbling_rows(live: DataFrame, window: str) -> DataFrame:
    return _window_rows(live, window)


def _sliding_rows(live: DataFrame, window: str, slide: str) -> DataFrame:
    return _window_rows(live, window, slide)


def sliding_state_batch(
    envelopes: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
) -> DataFrame:
    """Batch twin / oracle for :func:`sliding_state_stream`."""
    from ..operators.cdc import apply_changelog

    return _sliding_rows(apply_changelog(envelopes), window, slide)


def _session_rows(live: DataFrame, gap: str) -> DataFrame:
    return (
        live.groupBy("conv_id", F.session_window("ts", gap).alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.min("turn_idx").alias("first_turn"),
            F.max("turn_idx").alias("last_turn"),
        )
        .select(
            "conv_id",
            F.col("sw.start").alias("sess_start"),
            F.col("sw.end").alias("sess_end"),
            "n_turns",
            "first_turn",
            "last_turn",
        )
    )


SESSION_VIEW_DDL = (
    "conv_id string, sess_start timestamp, sess_end timestamp,"
    " n_turns long, first_turn int, last_turn int, bucket int"
)


def maintained_view_stream(
    spark: SparkSession,
    spool_dir: str,
    state_sink: MergeParquetSink,
    view_sink: GroupedReplaceParquetSink,
    checkpoint_dir: str,
    recompute,
    max_files_per_trigger: int | None = 1,
):
    """Maintain state table + a per-conversation derived view together,
    exactly-once.

    Per micro-batch: MERGE the envelopes into ``state_sink``, then
    recompute the touched conversations' view rows from the post-merge
    state (bucket-pruned + broadcast-semi-joined to the touched keys)
    via ``recompute(live_turns) -> rows`` and grouped-replace them in
    ``view_sink``. Both commits are epoch-skipped, and the recompute
    reads only committed state, so any crash/replay interleaving
    converges (module doc). ``recompute`` may be ANY per-conv-complete
    aggregation — tumbling windows and turn-gap sessions ship below.
    """
    from .pipeline import envelope_stream

    env = envelope_stream(spark, spool_dir, max_files_per_trigger)

    def _batch(df: DataFrame, epoch_id: int) -> None:
        df = df.persist()
        try:
            state_sink.merge_changelog(df, epoch_id)
            keys = (
                df.select(
                    F.coalesce(
                        F.col("after.conv_id"), F.col("before.conv_id")
                    ).alias("conv_id")
                )
                .where(F.col("conv_id").isNotNull())
                .distinct()
            ).cache()
            buckets = [
                r["b"]
                for r in keys.select(
                    F.pmod(
                        F.xxhash64("conv_id"), F.lit(state_sink.n_buckets)
                    )
                    .cast("int")
                    .alias("b")
                )
                .distinct()
                .collect()
            ]
            state = state_sink._read_buckets(spark, buckets)
            live = (
                state.where(F.col("op") != "d")
                if state is not None
                else spark.createDataFrame([], state_sink._SCHEMA)
            )
            rows = recompute(live.join(F.broadcast(keys), "conv_id"))
            view_sink.replace_groups(keys, rows, epoch_id)
            keys.unpersist()
        finally:
            df.unpersist()

    q = (
        env.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return view_sink


def windowed_state_stream(
    spark: SparkSession,
    spool_dir: str,
    state_sink: MergeParquetSink,
    window_sink: GroupedReplaceParquetSink,
    checkpoint_dir: str,
    window: str = "10 minutes",
    max_files_per_trigger: int | None = 1,
):
    """Tumbling-window view maintained under upserts/deletes."""
    return maintained_view_stream(
        spark,
        spool_dir,
        state_sink,
        window_sink,
        checkpoint_dir,
        recompute=lambda live: _tumbling_rows(live, window),
        max_files_per_trigger=max_files_per_trigger,
    )


def sliding_state_stream(
    spark: SparkSession,
    spool_dir: str,
    state_sink: MergeParquetSink,
    window_sink: GroupedReplaceParquetSink,
    checkpoint_dir: str,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    max_files_per_trigger: int | None = 1,
):
    """Sliding-window view maintained under upserts/deletes: a ts move
    retracts the turn from EVERY window it covered and adds it to every
    window it now covers — W/S memberships per turn, all handled by the
    same recompute-from-state commit (no per-membership retraction
    bookkeeping)."""
    return maintained_view_stream(
        spark,
        spool_dir,
        state_sink,
        window_sink,
        checkpoint_dir,
        recompute=lambda live: _sliding_rows(live, window, slide),
        max_files_per_trigger=max_files_per_trigger,
    )


def session_state_stream(
    spark: SparkSession,
    spool_dir: str,
    state_sink: MergeParquetSink,
    session_sink: GroupedReplaceParquetSink,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    max_files_per_trigger: int | None = 1,
):
    """Turn-gap sessionization maintained under upserts/deletes — the
    view append-mode session windows cannot express: a DELETED middle
    turn can SPLIT a session in two, and an update that moves a turn
    into a gap can MERGE two sessions; recompute-from-state yields the
    exact post-change sessions either way (tests/test_ivm.py).

    Construct the sink with the session schema::

        GroupedReplaceParquetSink(root, schema_ddl=SESSION_VIEW_DDL)
    """
    return maintained_view_stream(
        spark,
        spool_dir,
        state_sink,
        session_sink,
        checkpoint_dir,
        recompute=lambda live: _session_rows(live, gap),
        max_files_per_trigger=max_files_per_trigger,
    )


def sessions_state_batch(envelopes: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Batch twin / oracle for :func:`session_state_stream`."""
    from ..operators.cdc import apply_changelog

    return _session_rows(apply_changelog(envelopes), gap)
