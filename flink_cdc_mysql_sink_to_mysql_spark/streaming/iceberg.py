"""Iceberg sink path (config-selected; SURVEY.md §7 watch list).

The north rule targets an Iceberg table; this sandbox has no Iceberg
runtime jars, so the default sink is the parquet MERGE shim
(streaming/sink.py) with identical semantics. This module is the real
Iceberg path — same `merge_changelog(batch, epoch_id)` contract — used
when the session has an Iceberg catalog configured::

    spark.sql.catalog.cdc = org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.cdc.type = hadoop | hive | rest
    spark.sql.extensions = org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions

Swap `MergeParquetSink` for `IcebergMergeSink` in
pipeline.materialize_stream / jobs/changelog_apply_job.py and nothing
else changes: exactly-once still rests on (a) replayable source,
(b) deterministic LWW reduction of each micro-batch, (c) an idempotent
MERGE keyed on (conv_id, turn_idx) — re-running an epoch re-applies the
same winners and converges. Iceberg's snapshot isolation additionally
makes each MERGE an atomic commit (the shim's manifest emulates this).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession, catalog: str = "cdc") -> bool:
    """True iff an Iceberg catalog is usable in this session."""
    try:
        spark.sql(f"SHOW NAMESPACES IN {catalog}")
        return True
    except Exception:
        return False


@dataclass
class IcebergMergeSink:
    """Exactly-once upsert sink backed by a real Iceberg table."""

    table: str  # e.g. "cdc.db.transcript_turns"

    DDL = (
        "(conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp, seq bigint, op string)"
        " USING iceberg PARTITIONED BY (bucket(64, conv_id))"
    )

    def ensure_table(self, spark: SparkSession) -> None:
        spark.sql(f"CREATE TABLE IF NOT EXISTS {self.table} {self.DDL}")

    def merge_changelog(self, batch: DataFrame, epoch_id: int) -> dict:
        """foreachBatch body: LWW-reduce the micro-batch, then MERGE.

        The pre-MERGE reduction keeps one winner per key so the MERGE
        never sees duplicate source keys (Iceberg rejects them), and the
        `seq`-guarded WHEN clauses make replays no-ops — an epoch id
        table is unnecessary, idempotence is value-level.
        """
        spark = batch.sparkSession
        self.ensure_table(spark)
        op_rank = (
            F.when(F.col("op") == "d", 3)
            .when(F.col("op") == "u", 2)
            .when(F.col("op") == "c", 1)
            .otherwise(0)
        )
        delta = (
            batch.select(
                F.coalesce(F.col("after.conv_id"), F.col("before.conv_id")).alias(
                    "conv_id"
                ),
                F.coalesce(F.col("after.turn_idx"), F.col("before.turn_idx"))
                .cast("int")
                .alias("turn_idx"),
                F.col("after.role").alias("role"),
                F.col("after.text").alias("text"),
                F.col("after.tool").alias("tool"),
                F.col("after.ts").alias("ts"),
                F.col("seq").cast("long").alias("seq"),
                F.col("op"),
                (F.col("seq").cast("long") * 4 + op_rank).alias("ord"),
            )
            .where(F.col("conv_id").isNotNull())
            .groupBy("conv_id", "turn_idx")
            .agg(F.max_by(F.struct("role", "text", "tool", "ts", "seq", "op"), "ord").alias("w"))
            .select("conv_id", "turn_idx", "w.*")
        )
        delta.createOrReplaceTempView(f"_delta_{epoch_id}")
        spark.sql(
            f"""
            MERGE INTO {self.table} t
            USING _delta_{epoch_id} s
            ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
            WHEN MATCHED AND s.seq * 4 > t.seq * 4 AND s.op = 'd' THEN DELETE
            WHEN MATCHED AND s.seq * 4 > t.seq * 4 THEN UPDATE SET *
            WHEN NOT MATCHED AND s.op != 'd' THEN INSERT *
            """
        )
        return {"epoch": int(epoch_id), "table": self.table}

    def snapshot(self, spark: SparkSession) -> DataFrame:
        return spark.table(self.table).where(F.col("op") != "d")
