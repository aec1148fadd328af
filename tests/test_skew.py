"""Salted-aggregation and salted-repartition correctness (plans/skew.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_cdc_mysql_sink_to_mysql_spark.plans import skew


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key with 50x the mass of the others
    return spark.range(20_000).select(
        F.when(F.col("id") % 2 == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 100).cast("string")))
        .alias("key"),
        (F.col("id") % 7).cast("double").alias("v"),
    )


def test_salted_agg_equals_direct(spark, skewed):
    direct = {
        r.key: (r.s, r.c, r.mn, r.mx)
        for r in skewed.groupBy("key")
        .agg(
            F.sum("v").alias("s"),
            F.count("v").alias("c"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        r.key: (r.s, r.c, r.mn, r.mx)
        for r in skew.salted_agg(
            skewed,
            ["key"],
            {
                "s": ("sum", "v"),
                "c": ("count", "v"),
                "mn": ("min", "v"),
                "mx": ("max", "v"),
            },
            buckets=16,
            salt_source="v",
        ).collect()
    }
    assert salted == direct


def test_salted_agg_rejects_non_algebraic(skewed):
    with pytest.raises(ValueError):
        skew.salted_agg(
            skewed, ["key"], {"a": ("avg", "v")}, salt_source="v"
        )


def test_salted_agg_requires_within_key_salt(skewed):
    """A salt derived from the group key itself spreads nothing — the
    partial phase would have exactly the groups of the final phase."""
    with pytest.raises(ValueError):
        skew.salted_agg(skewed, ["key"], {"s": ("sum", "v")})
    with pytest.raises(ValueError):
        skew.salted_agg(skewed, ["key"], {"s": ("sum", "v")}, salt_source="key")


def test_salted_agg_spreads_hot_key(spark, skewed):
    """The hot key's partial-agg rows must span >1 (key, salt) group —
    the property the round-1 advisor showed the equality test misses."""
    partial = (
        skewed.withColumn("_salt", skew.salt_col("v", buckets=16))
        .groupBy("key", "_salt")
        .agg(F.sum("v").alias("s"))
    )
    n_groups = partial.where(F.col("key") == "hot").count()
    assert n_groups > 1, "hot key collapsed to a single salted group"


def test_hot_keys_detects_planted_head_and_is_bounded(spark, skewed):
    """hot_keys finds the 50x key, no tail key, and its result size is
    bounded by 1/min_frac regardless of corpus size."""
    hot = skew.hot_keys(skewed, ["key"], min_frac=0.05).collect()
    assert [r.key for r in hot] == ["hot"]
    assert hot[0].hot_count == 10_000
    every = skew.hot_keys(skewed, ["key"], min_frac=0.001)
    assert every.count() <= 1000  # the structural bound
    # sampled detection still finds the 50x head; hot_count is a
    # scaled estimate within a loose tolerance
    sampled = skew.hot_keys(
        skewed, ["key"], min_frac=0.05, sample_frac=0.2
    ).collect()
    assert [r.key for r in sampled] == ["hot"]
    assert 7_000 <= sampled[0].hot_count <= 13_000


def test_selective_salted_agg_equals_direct(spark, skewed):
    direct = {
        r.key: (r.s, r.c, r.mn, r.mx)
        for r in skewed.groupBy("key")
        .agg(
            F.sum("v").alias("s"),
            F.count("v").alias("c"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    hot = skew.hot_keys(skewed, ["key"], min_frac=0.05)
    adaptive = {
        r.key: (r.s, r.c, r.mn, r.mx)
        for r in skew.selective_salted_agg(
            skewed,
            ["key"],
            {
                "s": ("sum", "v"),
                "c": ("count", "v"),
                "mn": ("min", "v"),
                "mx": ("max", "v"),
            },
            hot=hot,
            buckets=16,
            salt_source="v",
        ).collect()
    }
    assert adaptive == direct


def test_selective_salting_spreads_hot_only(spark, skewed):
    """The point of the adaptive plan: the hot key spans >1 partial
    group, every cold key keeps exactly one — the partial relation
    stays ≈ #groups rows, not #groups×buckets."""
    hot = skew.hot_keys(skewed, ["key"], min_frac=0.05)
    marker = F.broadcast(
        hot.select("key").withColumn("_hot", F.lit(True))
    )
    partial = (
        skewed.join(marker, ["key"], "left")
        .withColumn(
            "_salt",
            F.when(F.col("_hot"), skew.salt_col("v", buckets=16)).otherwise(
                F.lit(0)
            ),
        )
        .groupBy("key", "_salt")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_partials"))
    )
    rows = {r.key: r.n_partials for r in partial.collect()}
    assert rows.pop("hot") > 1
    assert set(rows.values()) == {1}


def test_selective_salted_agg_guards(spark, skewed):
    hot = skew.hot_keys(skewed, ["key"], min_frac=0.05)
    with pytest.raises(ValueError):
        skew.selective_salted_agg(
            skewed, ["key"], {"a": ("avg", "v")}, hot=hot, salt_source="v"
        )
    with pytest.raises(ValueError):
        skew.selective_salted_agg(
            skewed, ["key"], {"s": ("sum", "v")}, hot=hot, salt_source="key"
        )


def test_repartition_salted_requires_secondary(skewed):
    with pytest.raises(ValueError):
        skew.repartition_salted(skewed, "key", buckets=16)


def test_repartition_salted_spreads_hot_key(spark, skewed):
    # AQE would coalesce this tiny shuffle back to one partition; disable
    # it so the partition-spread property is observable at test scale.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        parts = (
            skew.repartition_salted(skewed, "key", buckets=16, secondary="v")
            .where(F.col("key") == "hot")
            .select(F.spark_partition_id().alias("p"))
            .distinct()
            .count()
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert parts > 1, "hot key must span multiple partitions after salting"


def test_hot_key_changelog_apply_completes(spark):
    """SURVEY §5.2 item 6: a changelog with 5% of all turns in ONE hot
    conversation applies correctly (no straggler blowup at test scale;
    same generator the scaling bench uses at 10M turns)."""
    from flink_cdc_mysql_sink_to_mysql_spark.operators import cdc
    from flink_cdc_mysql_sink_to_mysql_spark.plans.scaling import (
        HOT_EVERY,
        synth_envelopes,
    )

    n = 200_000
    env = synth_envelopes(spark, n)
    out = cdc.apply_changelog(env)
    got_total = out.count()
    got_hot = out.where(F.col("conv_id") == "hot").count()
    # every turn_idx is unique → rows = n − deletes (id % 50 == 13)
    deletes = sum(1 for i in range(n) if i % 50 == 13)
    assert got_total == n - deletes
    hot_expected = sum(
        1 for i in range(n) if i % HOT_EVERY == 0 and i % 50 != 13
    )
    assert got_hot == hot_expected


def test_iceberg_sink_gated(spark):
    """The Iceberg path is config-selected; without catalog jars it
    reports unavailable (and the parquet MERGE shim is used instead)."""
    from flink_cdc_mysql_sink_to_mysql_spark.streaming import iceberg

    assert iceberg.iceberg_available(spark) is False
