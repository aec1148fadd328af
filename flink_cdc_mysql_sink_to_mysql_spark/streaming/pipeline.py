"""Structured-Streaming wrapper: envelope feeds → derive → sinks.

Mirrors the reference job topology (UserBehaviorClickHouseSinkJob.java:
59-97: two CDC sources → union → batched sink, 3 s checkpoints) in
Structured Streaming:

    readStream(envelopes) ──┐
    readStream(mongo feed) ─┴→ unionByName → withWatermark
        → foreachBatch MERGE (exactly-once upsert, streaming/sink.py)
        → and/or windowed aggregations (operators/windows.py)

Checkpointing: `checkpointLocation` persists source offsets + commit
log — the analog of Flink's enableCheckpointing(3000) (`:61`); restart
resumes from the last committed microbatch, and the MERGE sink's
idempotence makes the overlap harmless (exactly-once effective).

Rate control: `maxFilesPerTrigger` stands in for the reference's
batch-size/flush-interval knobs (`:84-85`).
"""

from __future__ import annotations

import json
import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

ENVELOPE_DDL = (
    "op string,"
    " before struct<conv_id:string,turn_idx:int,role:string,text:string,"
    "tool:string,ts:timestamp>,"
    " after struct<conv_id:string,turn_idx:int,role:string,text:string,"
    "tool:string,ts:timestamp>,"
    " source struct<db:string,table:string>,"
    " seq long"
)


def envelope_stream(
    spark: SparkSession,
    spool_dir: str,
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """File-based streaming source of Debezium-shaped envelope rows.

    In production this is `readStream.format("iceberg")` (or Kafka with
    from_json) on the append-only changelog; the file spool keeps the
    identical plan shape in-sandbox. maxFilesPerTrigger bounds batch
    size (reference flush-batching analog).
    """
    reader = spark.readStream.schema(ENVELOPE_DDL)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(spool_dir)


class LineageListener(StreamingQueryListener):
    """Per-microbatch lineage + row-count metrics (north rule: restarts
    resume with per-partition lineage and row-count metrics)."""

    def __init__(self, out_path: str):
        self.out_path = out_path

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = event.progress
        rec = {
            "batchId": p.batchId,
            "numInputRows": p.numInputRows,
            "sources": [
                {"description": s.description, "numInputRows": s.numInputRows}
                for s in p.sources
            ],
            "observed": dict(p.observedMetrics.get("engine").asDict())
            if p.observedMetrics.get("engine")
            else None,
            "durationMs": dict(p.durationMs),
        }
        with open(self.out_path, "a") as f:
            f.write(json.dumps(rec, default=str) + "\n")

    def onQueryTerminated(self, event):
        pass

    def onQueryIdle(self, event):
        pass


def materialize_stream(
    spark: SparkSession,
    spool_dir: str,
    sink,
    checkpoint_dir: str,
    watermark_delay: str = "1 hour",
    max_files_per_trigger: int | None = 1,
    lineage_path: str | None = None,
):
    """Run the changelog→table materialization as a stream, available-now.

    Returns after the spool is drained (Trigger.AvailableNow analog of a
    bounded replay); re-invoking with the same checkpoint resumes at the
    committed offset — the kill/resume path tests/test_streaming.py pins.
    """
    # NOTE: the MERGE path needs no watermark (upserts are key-complete);
    # watermark_delay is honored by the windowed query path below.
    env = envelope_stream(spark, spool_dir, max_files_per_trigger)
    env = env.observe(
        "engine",
        F.count(F.lit(1)).alias("rows"),
        # DISTINCT aggs are disallowed in observed metrics → HLL sketch
        F.approx_count_distinct(
            F.coalesce(F.col("after.conv_id"), F.col("before.conv_id"))
        ).alias("convs"),
    )

    listener = None
    if lineage_path:
        listener = LineageListener(lineage_path)
        spark.streams.addListener(listener)
    try:
        q = (
            env.writeStream.foreachBatch(
                lambda df, eid: sink.merge_changelog(df, eid)
            )
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if listener is not None:
            spark.streams.removeListener(listener)
    return sink


def windowed_counts_stream(
    spark: SparkSession,
    spool_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "10 minutes",
    watermark_delay: str = "30 minutes",
):
    """Event-time tumbling counts per conv_id with a real watermark —
    late rows beyond the delay are dropped by the state store (the
    north-rule late-data semantics; the reference has none, SURVEY §2.8).

    Append-mode parquet output: a window only emits once its watermark
    passes — restart-safe via the checkpoint.
    """
    env = envelope_stream(spark, spool_dir)
    turns = env.where(F.col("after").isNotNull()).select(
        F.col("after.conv_id").alias("conv_id"),
        F.col("after.ts").alias("ts"),
    )
    agg = (
        turns.withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window).alias("win"), "conv_id")
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "conv_id",
            "n_turns",
        )
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return out_dir


def spool_dataframe(df: DataFrame, spool_dir: str, name: str) -> str:
    """Append one bounded DataFrame to the spool as a single flat parquet
    file (atomic rename — the file source sees whole files only)."""
    import glob
    import shutil
    import uuid

    os.makedirs(spool_dir, exist_ok=True)
    tmp = os.path.join(spool_dir, f"_tmp-{uuid.uuid4().hex[:8]}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    p = os.path.join(spool_dir, name)
    os.replace(part, p)
    shutil.rmtree(tmp)
    return p


def spool_changelog(
    envelopes: DataFrame, spool_dir: str, n_chunks: int = 4, order_by: str = "seq"
) -> list[str]:
    """Write a bounded changelog into the spool as n_chunks files in seq
    order — a deterministic replayable 'binlog' the stream consumes.
    Chunks split by seq range so arrival order ≈ change order (the
    reference's binlog-order delivery, parallelism-1 analog)."""
    import glob
    import shutil

    os.makedirs(spool_dir, exist_ok=True)
    df = envelopes.withColumn(
        "_chunk", F.ntile(n_chunks).over(Window.orderBy(order_by))
    )
    paths = []
    for i in range(1, n_chunks + 1):
        tmp = os.path.join(spool_dir, f"_tmp-{i:03d}")
        df.where(F.col("_chunk") == i).drop("_chunk").coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        # the file source doesn't recurse — promote the single part file
        # to a flat chunk file (spool append = atomic rename)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        p = os.path.join(spool_dir, f"chunk-{i:03d}.parquet")
        os.replace(part, p)
        shutil.rmtree(tmp)
        paths.append(p)
    return paths
