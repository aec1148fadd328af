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
        ).collect()
    }
    assert salted == direct


def test_salted_agg_rejects_non_algebraic(skewed):
    with pytest.raises(ValueError):
        skew.salted_agg(skewed, ["key"], {"a": ("avg", "v")})


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
