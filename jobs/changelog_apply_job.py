#!/usr/bin/env python
"""spark-submit entrypoint: replay a transcript changelog into the
exactly-once upsert sink (the north-rule deployment shape).

Package the engine and submit::

    python -m zipfile -c /tmp/engine.zip flink_cdc_mysql_sink_to_mysql_spark
    spark-submit --master local[8] --py-files /tmp/engine.zip \
        jobs/changelog_apply_job.py \
        --sf-dir /root/testdata/sf0.001 --workdir /tmp/cdc-run

On a real cluster only ``--master`` changes (YARN/K8s); the job itself
is cluster-agnostic — no local filesystem assumptions beyond workdir
(point it at a shared mount / object store in production; the Iceberg
path swaps in for the parquet MERGE shim per SURVEY.md §7).

Re-running with the same --workdir resumes from the checkpoint and the
MERGE sink's idempotence keeps the result exactly-once (kill/resume is
pinned by tests/test_streaming.py; this job is the operational wrapper).

Prints ONE JSON summary line: rows materialized, microbatches, lineage.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import SparkSession  # noqa: E402

from flink_cdc_mysql_sink_to_mysql_spark.sources.transcripts import (  # noqa: E402
    mongo_changelog,
    mysql_changelog,
)
from flink_cdc_mysql_sink_to_mysql_spark.streaming import pipeline as pl  # noqa: E402
from flink_cdc_mysql_sink_to_mysql_spark.streaming.sink import (  # noqa: E402
    MergeParquetSink,
)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--chunks", type=int, default=4)
    ap.add_argument(
        "--n-buckets",
        type=int,
        default=32,
        help="sink hash buckets; size ≈ table_bytes / 128-256MB on a "
        "cluster (streaming/sink.py sizing note) — 32 suits the "
        "sf-scale tables this sandbox replays",
    )
    ap.add_argument(
        "--with-mongo",
        action="store_true",
        help="also stream the Mongo-dialect feed and union (U1)",
    )
    args = ap.parse_args()

    spark = SparkSession.builder.appName("changelog-apply").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.sparkContext.setLogLevel("ERROR")

    spool = os.path.join(args.workdir, "spool")
    ckpt = os.path.join(args.workdir, "checkpoint")
    sink = MergeParquetSink(
        root=os.path.join(args.workdir, "sink"), n_buckets=args.n_buckets
    )

    # spool the bounded changelog once (idempotent: skip if present)
    if not os.path.isdir(spool) or not os.listdir(spool):
        pl.spool_changelog(mysql_changelog(spark, args.sf_dir), spool, args.chunks)
    mongo_spool = None
    if args.with_mongo:
        mongo_spool = os.path.join(args.workdir, "spool_mongo")
        if not os.path.isdir(mongo_spool) or not os.listdir(mongo_spool):
            pl.spool_changelog(
                mongo_changelog(spark, args.sf_dir),
                mongo_spool,
                args.chunks,
                order_by="fullDocument.create_time.date",
            )

    def _lineage_lines(path: str) -> int:
        if not os.path.exists(path):
            return 0
        with open(path) as f:
            return sum(1 for _ in f)

    lineage = os.path.join(args.workdir, "lineage.jsonl")
    prior = _lineage_lines(lineage)
    pl.materialize_stream(
        spark, spool, sink, ckpt, lineage_path=lineage, mongo_spool_dir=mongo_spool
    )

    snap = sink.snapshot(spark)
    n = snap.count()
    batches = _lineage_lines(lineage) - prior
    print(
        json.dumps(
            {
                "rows_materialized": n,
                "microbatches_this_run": batches,
                "sink": sink.root,
                "checkpoint": ckpt,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
