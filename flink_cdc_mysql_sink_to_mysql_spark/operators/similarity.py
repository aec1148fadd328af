"""Approximate-nearest-neighbor search over an embedding column.

Brute-force cosine top-k is the correctness baseline; the scale path is
sign-bit LSH bucketing (random-hyperplane LSH with axis-aligned
hyperplanes — deterministic, engine-portable) that prunes the candidate
space to same-bucket vectors before the same cosine kernel runs.

Scale design:
- Brute-force top-k for Q query vectors is a broadcast join (Q small):
  the query side broadcasts, the corpus scans once, per-partition
  top-k via partial aggregation (Catalyst turns the rank-filter into
  WindowGroupLimit pushdown), so nothing near O(corpus) ever shuffles.
- LSH bucketing shuffles on an int bucket key once; hot buckets are
  split by AQE skew-join. An IVF variant (k-means centroids) would slot
  into the same shape — centroid assignment is a broadcast join of a
  tiny centroid table; omitted here because the sandbox has no
  clustering fit step worth its cost at test scale.

Cosine kernel = fixed-order double fold (see operators/dedup.py) —
bit-identical Spark vs DuckDB, so scores and therefore rankings match
exactly (ties broken by vec_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import DOT_SQL, cosine, cosine_sql

LSH_BITS = 8  # bucket = sign bits of the first 8 dimensions


def _query_set(emb: DataFrame, every: int = 100) -> DataFrame:
    """Deterministic query subset: vec_id % every == 0."""
    return emb.where(F.col("vec_id") % every == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )


def cosine_topk(emb: DataFrame, k: int = 5, every: int = 100) -> DataFrame:
    """Exact top-k neighbors per query vector (brute force).

    Query side is broadcast (tiny); ranking is deterministic:
    (cos DESC, vec_id ASC).
    """
    q = F.broadcast(_query_set(emb, every))
    corpus = emb.select("vec_id", "embedding")
    scored = q.join(corpus, F.col("q_id") != F.col("vec_id")).select(
        "q_id",
        "vec_id",
        cosine(F.col("q_emb"), F.col("embedding")).alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", "cos", F.col("rank").cast("int").alias("rank"))
    )


def cosine_topk_sql(rel: str, k: int = 5, every: int = 100) -> str:
    cos = cosine_sql("q.embedding", "c.embedding")
    return f"""
    WITH scored AS (
      SELECT q.vec_id AS q_id, c.vec_id AS vec_id, {cos} AS cos
      FROM {rel} q JOIN {rel} c ON q.vec_id % {every} = 0
                               AND q.vec_id != c.vec_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY q_id
                                   ORDER BY cos DESC, vec_id ASC) AS rank
      FROM scored
    )
    SELECT q_id, vec_id, cos, CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= {k}
    """


def lsh_bucket(col) -> "F.Column":
    """Sign-bit LSH bucket id (int, 0..2^LSH_BITS-1) of an embedding."""
    bits = F.transform(
        F.sequence(F.lit(0), F.lit(LSH_BITS - 1)),
        lambda j: F.when(
            F.element_at(col, j + 1) >= 0.0,
            F.pow(F.lit(2.0), j).cast("int"),
        ).otherwise(F.lit(0)),
    )
    return F.aggregate(bits, F.lit(0), lambda a, b: a + b)


def lsh_bucket_sql(col: str) -> str:
    terms = " + ".join(
        f"CASE WHEN {col}[{j + 1}] >= 0.0 THEN {1 << j} ELSE 0 END"
        for j in range(LSH_BITS)
    )
    return f"({terms})"


def lsh_topk(emb: DataFrame, k: int = 5, every: int = 100) -> DataFrame:
    """ANN top-k: rank only within the query's LSH bucket.

    Approximate by construction — the oracle runs the SAME bucketed
    semantics (this is a definition of the operator, not a recall claim;
    recall vs exact top-k is measured in tests, not asserted equal).
    """
    with_bucket = emb.select(
        "vec_id", "embedding", lsh_bucket(F.col("embedding")).alias("bucket")
    )
    q = F.broadcast(
        with_bucket.where(F.col("vec_id") % every == 0).select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_emb"),
            F.col("bucket").alias("q_bucket"),
        )
    )
    scored = q.join(
        with_bucket,
        (F.col("q_bucket") == F.col("bucket"))
        & (F.col("q_id") != F.col("vec_id")),
    ).select(
        "q_id",
        "vec_id",
        cosine(F.col("q_emb"), F.col("embedding")).alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", "cos", F.col("rank").cast("int").alias("rank"))
    )


def lsh_topk_sql(rel: str, k: int = 5, every: int = 100) -> str:
    cos = cosine_sql("q.embedding", "c.embedding")
    qb = lsh_bucket_sql("q.embedding")
    cb = lsh_bucket_sql("c.embedding")
    return f"""
    WITH scored AS (
      SELECT q.vec_id AS q_id, c.vec_id AS vec_id, {cos} AS cos
      FROM {rel} q JOIN {rel} c
        ON q.vec_id % {every} = 0
       AND q.vec_id != c.vec_id
       AND {qb} = {cb}
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY q_id
                                   ORDER BY cos DESC, vec_id ASC) AS rank
      FROM scored
    )
    SELECT q_id, vec_id, cos, CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= {k}
    """
