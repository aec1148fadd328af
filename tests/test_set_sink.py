"""K2/K3 external-set sink: lifecycle, chunk bound, set idempotence.
(Reference: RedisSyncSink UserGroupClickHouseJob.java:154-188 + Split
chunking :144-151.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_cdc_mysql_sink_to_mysql_spark.streaming.set_sink import (
    FakeSetStore,
    sadd_sink,
)


@pytest.fixture()
def ids(spark):
    return spark.range(25_000).select(F.col("id").alias("conv_id"))


def test_sadd_sink_writes_all_ids(spark, tmp_path, ids):
    root = str(tmp_path / "store")
    n = sadd_sink(ids, root, key="cohort:rule0", chunk_size=1000)
    assert n == 25_000
    assert FakeSetStore(root).members("cohort:rule0") == set(range(25_000))


def test_chunk_bound_and_lifecycle(spark, tmp_path, ids):
    root = str(tmp_path / "store")
    sadd_sink(ids.repartition(4), root, key="k", chunk_size=1000)
    store = FakeSetStore(root)
    metas = store.client_metas()
    # one client per partition, each opened AND closed
    assert len(metas) == 4
    assert all(m["closed"] for m in metas)
    # every SADD call's payload respects the K3 bound
    assert all(0 < s <= 1000 for m in metas for s in m["chunk_sizes"])
    # 25k ids over 4 partitions at 1k/chunk → ≥ 25 calls total
    assert sum(len(m["chunk_sizes"]) for m in metas) >= 25


def test_replay_is_invisible_set_semantics(spark, tmp_path, ids):
    """At-least-once delivery (task retry / job re-run) collapses under
    SADD set semantics — the reference's idempotence story."""
    root = str(tmp_path / "store")
    sadd_sink(ids, root, key="k")
    sadd_sink(ids, root, key="k")  # full replay
    assert FakeSetStore(root).members("k") == set(range(25_000))


def test_rejects_multi_column_frames(spark, tmp_path):
    df = spark.range(5).select("id", F.lit("x").alias("extra"))
    with pytest.raises(ValueError):
        sadd_sink(df, str(tmp_path), key="k")


def test_cohort_to_set_sink_end_to_end(spark, tmp_path):
    """Job-3 shape end-to-end: rule → cohort conv_ids → chunked SADD."""
    from flink_cdc_mysql_sink_to_mysql_spark.operators import cdc, cohort
    from flink_cdc_mysql_sink_to_mysql_spark.sources.transcripts import (
        mongo_changelog,
        mysql_changelog,
    )

    sf = "/root/testdata/sf0.001"
    env = cdc.union_feeds(mysql_changelog(spark, sf), mongo_changelog(spark, sf))
    events = cdc.derive_turn_events(env)
    rule = cohort.CohortRule(target=1, is_exist=True, value_days=14)
    out = cohort.exist_conv_ids(events, rule, "2024-01-30 00:00:00")
    expected = {r.conv_id for r in out.collect()}

    root = str(tmp_path / "store")
    n = sadd_sink(out, root, key="cohort:exist")
    assert n == len(expected)
    assert FakeSetStore(root).members("cohort:exist") == expected
