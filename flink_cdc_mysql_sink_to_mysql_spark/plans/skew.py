"""Explicit skew handling for hot conversations.

The transcript changelog is zipf-skewed on ``conv_id`` (one hot
conversation can be orders of magnitude larger than the median). Three
layers of defense, composable:

1. **AQE skew-join** — on by default in session.py
   (``spark.sql.adaptive.skewJoin.enabled``): splits oversized join
   partitions at runtime. Covers the stream-stream join and cohort
   anti-join without code changes.
2. **Salted repartition** (:func:`repartition_salted`) — for *stateless*
   stages (event derivation, mapInPandas feature extraction): spreads a
   hot key over N buckets so no single task owns the whole hot
   conversation. Safe because stateless stages never group by the key.
3. **Two-phase salted aggregation** (:func:`salted_agg`) — for keyed
   aggregations with algebraic (commutative+associative) aggregates:
   partial agg on (key, salt) → final agg on key. The hot key's rows are
   reduced in parallel across S tasks before the single final combine
   touches S pre-aggregated rows instead of the raw row count.
   ``max_by`` (the LWW winner pick in cdc.apply_changelog) is algebraic,
   so the same trick applies to changelog materialization if a single
   (conv_id, turn_idx) ever became hot — in practice the LWW key
   includes turn_idx, which already spreads hot conversations.

4. **Adaptive (hot-key-only) salting** (:func:`hot_keys` +
   :func:`selective_salted_agg`) — detect the keys that actually carry
   ≥ min_frac of the rows (≤ 1/min_frac keys by construction, always
   broadcastable), then salt ONLY those: the zipf head spreads across
   buckets while the long tail keeps its optimal single-partial plan,
   so the final combine never pays the ×buckets partial-row tax for
   cold keys.

**Measured decision rule** (bench.py --skew-compare, BENCH/BASELINE.md
§2h): for ALGEBRAIC aggregates, use the DIRECT plan — Spark's map-side
partial aggregation already reduces a hot key to one row per task
before the shuffle, and the direct form measured ~2× faster than any
salted variant on the 5%-hot zipf changelog. Reach for salting only
where partial agg cannot compress (collect-heavy payloads,
distinct-like aggregates); there prefer the adaptive form with sampled
detection — blanket salting ships #groups×buckets partial rows, which
at high key cardinality is the difference between a working plan and a
32× bigger shuffle.

Note what salting can NOT do (SURVEY.md §7 watch list): keyed *state*
(session windows, stream-stream join state) is keyed by conv_id and
cannot be salted without changing semantics — there the mitigation is
watermark-based state eviction, AQE, and per-key state size caps.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_col(*key_cols: str | Column, buckets: int = 32) -> Column:
    """Deterministic salt in [0, buckets) from a secondary hash — derived
    from the full row key so replays land on the same salt (exactly-once
    MERGE stays idempotent)."""
    return F.pmod(F.xxhash64(*key_cols), F.lit(buckets)).cast("int")


def repartition_salted(
    df: DataFrame, key: str, buckets: int = 32, secondary: str | None = None
) -> DataFrame:
    """Repartition by (hash(key), salt) so a hot key spans `buckets`
    partitions. For stateless downstream stages only.

    ``secondary`` is REQUIRED and must vary *within* a key: a salt
    derived from the key alone hashes every row of the hot key to the
    same bucket — (key, salt) would have exactly the same groups as the
    key itself, i.e. zero spreading (round-1 advisor finding).
    """
    if secondary is None:
        raise ValueError(
            "repartition_salted needs a `secondary` column that varies "
            "within a key (e.g. turn_idx/ts/seq); salting by the key "
            "alone spreads nothing"
        )
    salt = salt_col(key, secondary, buckets=buckets)
    return df.repartition(F.col(key), salt)


_ALGEBRAIC = {"sum", "count", "min", "max"}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    buckets: int = 32,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys+salt) partial → groupBy(keys)
    final. ``aggs`` maps output name → (fn, column), fn in
    {sum, count, min, max}. Result is row-identical to the direct
    groupBy (algebraic aggregates), verified in tests/test_skew.py.

    ``salt_source`` is REQUIRED and must vary within a key (turn_idx,
    ts, seq, the aggregated value...): a salt derived from the group key
    gives every row of a key the same salt, so groupBy(keys+salt) has
    exactly the same groups as groupBy(keys) and the two-phase plan
    spreads nothing (round-1 advisor finding — the equality test can't
    catch it because equality is then trivial; the spread itself is now
    asserted in tests/test_skew.py::test_salted_agg_spreads_hot_key).

    count re-aggregates as sum in the final phase; the others are
    idempotent under re-application.
    """
    unknown = {fn for fn, _ in aggs.values()} - _ALGEBRAIC
    if unknown:
        raise ValueError(f"non-algebraic aggregate(s): {sorted(unknown)}")
    if salt_source is None or salt_source in keys:
        raise ValueError(
            "salted_agg needs a `salt_source` column that varies within "
            f"a key (got {salt_source!r}); salting by the group key "
            "alone yields the same groups as the unsalted plan"
        )

    salt = salt_col(salt_source, buckets=buckets)
    return _two_phase(df.withColumn("_salt", salt), keys, aggs)


def _two_phase(
    salted: DataFrame, keys: list[str], aggs: dict[str, tuple[str, str]]
) -> DataFrame:
    """groupBy(keys+_salt) partial → groupBy(keys) final (the shared
    core of :func:`salted_agg` and :func:`selective_salted_agg`)."""
    partial_exprs = [
        getattr(F, fn)(col).alias(name) for name, (fn, col) in aggs.items()
    ]
    partial = salted.groupBy(*keys, "_salt").agg(*partial_exprs)
    final_exprs = [
        (F.sum(name) if fn == "count" else getattr(F, fn)(name))
        .cast(partial.schema[name].dataType if fn != "count" else "long")
        .alias(name)
        for name, (fn, _) in aggs.items()
    ]
    return partial.groupBy(*keys).agg(*final_exprs)


def hot_keys(
    df: DataFrame,
    keys: list[str],
    min_frac: float = 0.01,
    sample_frac: float | None = None,
    seed: int = 42,
) -> DataFrame:
    """Keys carrying at least ``min_frac`` of the rows — the detection
    half of adaptive skew handling. One scan of ``df`` (groupBy count);
    the total is derived from the counts themselves (a scalar agg over
    #groups rows, NOT a second raw scan), joined in as a broadcast
    1-row literal so the filter stays in the same job.

    ``sample_frac`` runs the detection on a seeded Bernoulli sample
    instead of the full input — sound for THIS purpose because a hot
    key is by definition frequent: a key at true fraction p lands in a
    q-sample with expected count p·q·n, and at p ≥ min_frac = 0.01,
    q·n ≥ 10⁵ the relative error is ~(p·q·n)^-½ ≤ 3%. Detection is
    advisory (a missed borderline key only means one key stays on the
    direct plan), so the variance trade is safe; hot_count is then an
    ESTIMATE (scaled back up by 1/q).

    The result is small by construction (≤ 1/min_frac rows in
    expectation — at min_frac=0.01 about 100 keys regardless of corpus
    size), so callers can always ``F.broadcast`` it.
    """
    scale = 1.0
    if sample_frac is not None:
        df = df.sample(fraction=sample_frac, seed=seed)
        scale = 1.0 / sample_frac
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("_cnt"))
    total = counts.agg(F.sum("_cnt").alias("_total"))
    return (
        counts.join(F.broadcast(total))
        .where(F.col("_cnt") >= F.col("_total") * F.lit(min_frac))
        .select(
            *keys,
            (F.col("_cnt") * F.lit(scale)).cast("long").alias("hot_count"),
        )
    )


def hot_keys_from_feed(spark, hot_dir: str, min_batches: int = 1) -> DataFrame:
    """The ONLINE detection path: hot keys from the per-micro-batch
    feed ``materialize_stream(..., track_hot_convs=N)`` writes
    (one epoch-keyed JSON file per batch) — a conversation is hot if it
    made the top-N in at least ``min_batches`` micro-batches. The feed
    is tiny (≤ N rows per batch), so this reads as one small JSON scan
    and the result is always broadcastable; feed it straight into
    :func:`selective_salted_agg` — detection then costs the
    DOWNSTREAM job nothing (the stream already paid it).

    Returns (conv_id, hot_count) like :func:`hot_keys` — hot_count is
    the summed per-batch envelope count (a lower bound on the key's
    true total: batches where it missed the top-N contribute 0).
    """
    import json
    import os

    rows: dict[str, tuple[int, int]] = {}  # conv -> (batches, total)
    if os.path.isdir(hot_dir):
        for name in sorted(os.listdir(hot_dir)):
            if not name.startswith("epoch-"):
                continue
            with open(os.path.join(hot_dir, name)) as f:
                rec = json.load(f)
            for conv, n in rec["hot"]:
                b, t = rows.get(conv, (0, 0))
                rows[conv] = (b + 1, t + int(n))
    data = [
        (conv, t) for conv, (b, t) in rows.items() if b >= min_batches
    ]
    return spark.createDataFrame(data, "conv_id string, hot_count long")


def selective_salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    hot: DataFrame,
    buckets: int = 32,
    salt_source: str | None = None,
) -> DataFrame:
    """Adaptive two-phase aggregation: ONLY the keys listed in ``hot``
    (e.g. from :func:`hot_keys`) are salted across ``buckets`` partial
    groups; every cold key keeps a single partial row (salt 0). Same
    contract as :func:`salted_agg` — algebraic aggregates, row-identical
    to the direct groupBy — but the partial relation stays ≈ #groups
    rows instead of #groups·buckets, so the final combine does not pay
    the salting tax for the (vast) cold majority. One plan, no union:
    rows are tagged hot via a broadcast left join on the key, and the
    salt expression is conditional.

    This is the right default at zipf scale: blanket salting multiplies
    the partial row count by ``buckets`` for every key; hot-key-only
    salting spreads the handful of keys that actually overflow a task
    while leaving the long tail on the optimal single-partial plan.
    """
    unknown = {fn for fn, _ in aggs.values()} - _ALGEBRAIC
    if unknown:
        raise ValueError(f"non-algebraic aggregate(s): {sorted(unknown)}")
    if salt_source is None or salt_source in keys:
        raise ValueError(
            "selective_salted_agg needs a `salt_source` column that "
            f"varies within a key (got {salt_source!r}); salting by the "
            "group key alone yields the same groups as the unsalted plan"
        )
    marker = F.broadcast(
        hot.select(*keys).withColumn("_hot", F.lit(True))
    )
    salted = df.join(marker, keys, "left").withColumn(
        "_salt",
        F.when(F.col("_hot"), salt_col(salt_source, buckets=buckets))
        .otherwise(F.lit(0)),
    ).drop("_hot")
    return _two_phase(salted, keys, aggs)
