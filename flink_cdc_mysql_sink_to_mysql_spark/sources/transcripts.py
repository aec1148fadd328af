"""Deterministic transcript table + Debezium-shaped changelog feeds.

The north-rule input is an Iceberg table of multi-turn conversation
transcripts ``(conv_id, turn_idx, role, text, tool, ts)``. In this sandbox
the only driver-provided data is the TPC-H-ish testdata; we therefore
derive the transcript table **deterministically** from the ``events``
parquet (seed-42, driver-generated) with a pure relational mapping that is
expressible identically in Spark and ANSI SQL (DuckDB) — this is what
gives every CDC operator a real value-level oracle.

Mapping (events → transcripts):
- ``conv_id``  = 'c' || user_id            (conversation = user stream)
- ``turn_idx`` = row_number over (user_id order by ts, event_id) - 1
- ``role``     = event_type → {click: user, view: assistant,
                 purchase: tool, error: tool, signup: system}
- ``text``     = event_type || ' ' || props (pure string concat — exact
                 cross-engine equality, the per-turn invariant)
- ``tool``     = 'tool_' || event_type when role = 'tool' else null
- ``ts``       = ts

Changelog feeds (mirror the reference's two CDC dialects):

1. **mysql dialect** (Debezium ``op/before/after``, analog of
   `UserBehaviorDebeziumDeserializer.java:42-78`): rows with
   ``event_id % 7 != 3``. Every row emits a base op ('r' for
   ``turn_idx < 3`` — the snapshot phase — else 'c'); rows with
   ``event_id % 10 = 7`` were *edited*: if they are past the snapshot
   boundary (``turn_idx >= 3``) the edit arrives as a separate 'u'
   envelope 60 s later; if they fall INSIDE the snapshot
   (``turn_idx < 3``) the edit pre-dates the connector start, so there
   is no binlog event for it — instead the snapshot 'r' row carries its
   own history: ``before`` = the original turn, ``after`` = the edited
   turn at ts+60 s (the D5 historical-pair shape, `op='r'` +
   delete_status=DELETED emitting COLLECT@create_time +
   UN_COLLECT@update_time, UserBehaviorDebeziumDeserializer.java:
   157-192). Rows with ``event_id % 50 = 13`` additionally emit a 'd'
   120s later. ``seq`` (epoch millis) totally orders the changelog per
   key, mirroring binlog order.

2. **mongo dialect** (``operationType/fullDocument`` with extended-JSON
   scalars, analog of `UserReviewBehaviorDebeziumDeserializer.java:44-52`):
   rows with ``event_id % 7 = 3``, insert-only, operationType cased
   'INSERT' to exercise the reference's case-insensitive match (`:44`).

All generation is branch-free deterministic arithmetic on (event_id,
turn_idx) — no wall clock, no RNG — so golden outputs are stable and the
same rows regenerate at any scale factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TRANSCRIPT_FIELDS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

_ROLE_MAP = {
    "click": "user",
    "view": "assistant",
    "purchase": "tool",
    "error": "tool",
    "signup": "system",
}


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The base transcript table (F1 in FIXTURES.md).

    Scale note: row_number per conv_id is a single hash-partitioned
    window — at 100 TB the events source would already be bucketed by
    user_id so this is shuffle-free; locally it is one shuffle.
    """
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    role = F.element_at(
        F.create_map(*[F.lit(x) for kv in _ROLE_MAP.items() for x in kv]),
        F.col("event_type"),
    )
    return ev.select(
        F.concat(F.lit("c"), F.col("user_id").cast("string")).alias("conv_id"),
        (F.row_number().over(w) - F.lit(1)).cast("int").alias("turn_idx"),
        role.alias("role"),
        F.concat(F.col("event_type"), F.lit(" "), F.col("props")).alias("text"),
        F.when(
            role == "tool", F.concat(F.lit("tool_"), F.col("event_type"))
        ).alias("tool"),
        # parquet reads as TIMESTAMP_NTZ; pin to TIMESTAMP (session tz is
        # UTC) so epoch arithmetic matches DuckDB's naive-as-UTC epoch_ms.
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("event_id"),  # carried for deterministic changelog derivation
    )


# SQL fragment producing the identical transcript relation in DuckDB.
# Kept adjacent to the Spark code so the two stay in lockstep.
TRANSCRIPTS_SQL = """
SELECT 'c' || CAST(user_id AS VARCHAR) AS conv_id,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INTEGER) AS turn_idx,
       CASE event_type WHEN 'click' THEN 'user' WHEN 'view' THEN 'assistant'
            WHEN 'purchase' THEN 'tool' WHEN 'error' THEN 'tool'
            WHEN 'signup' THEN 'system' END AS role,
       event_type || ' ' || props AS text,
       CASE WHEN event_type IN ('purchase','error') THEN 'tool_' || event_type END AS tool,
       ts,
       event_id
FROM events
"""


def _turn_struct(prefix: str = "") -> "F.Column":
    return F.struct(
        F.col(f"{prefix}conv_id").alias("conv_id"),
        F.col(f"{prefix}turn_idx").alias("turn_idx"),
        F.col(f"{prefix}role").alias("role"),
        F.col(f"{prefix}text").alias("text"),
        F.col(f"{prefix}tool").alias("tool"),
        F.col(f"{prefix}ts").alias("ts"),
    )


_TURN_T = (
    "struct<conv_id:string,turn_idx:int,role:string,text:string,"
    "tool:string,ts:timestamp>"
)


def _mysql_event_array() -> "F.Column":
    """``array<struct<op,before,after,seq>>`` emitted by one
    mysql-dialect transcript row (nulls already filtered out) — the
    multi-emit logic shared by :func:`mysql_changelog` and
    :func:`changelog_envelopes`; semantics in the module docstring."""
    seq0 = F.unix_millis(F.col("ts"))
    edited = F.concat(F.col("text"), F.lit(" [edited]"))
    is_snap = F.col("turn_idx") < 3
    is_edit = F.col("event_id") % 10 == 7
    is_hist = is_snap & is_edit  # edit pre-dates the snapshot boundary
    turn = _turn_struct()

    def edited_turn_at(ts_col):
        return F.struct(
            F.col("conv_id"),
            F.col("turn_idx"),
            F.col("role"),
            edited.alias("text"),
            F.col("tool"),
            ts_col.alias("ts"),
        )

    edited_turn = edited_turn_at(F.col("ts"))
    # the historical snapshot's "update_time": 60 s past the original
    edited_turn_snap = edited_turn_at(
        F.timestamp_millis(F.unix_millis(F.col("ts")) + 60000)
    )
    null_turn = F.lit(None).cast(_TURN_T)

    def env(op_col, before, after, seq):
        return F.struct(
            op_col.alias("op"),
            before.alias("before"),
            after.alias("after"),
            seq.cast("long").alias("seq"),
        )

    base = env(
        F.when(is_snap, F.lit("r")).otherwise(F.lit("c")),
        # D5 historical pair: the snapshot row carries its own history
        F.when(is_hist, turn).otherwise(null_turn),
        F.when(is_hist, edited_turn_snap).otherwise(turn),
        seq0,
    )
    update = F.when(
        is_edit & ~is_snap,
        env(F.lit("u"), turn, edited_turn, seq0 + 60000),
    )
    delete = F.when(
        F.col("event_id") % 50 == 13,
        env(
            F.lit("d"),
            F.when(is_edit, edited_turn).otherwise(turn),
            null_turn,
            seq0 + 120000,
        ),
    )
    return F.filter(F.array(base, update, delete), lambda e: e.isNotNull())


def mysql_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debezium-dialect changelog (F2): op/before/after/source/seq.

    SINGLE pass over the transcript table: each row conditionally emits
    its base op ('r'/'c'), an 'u' (+60 s) and a 'd' (+120 s) as an
    array of envelope structs → filter nulls → explode — so the
    row_number window behind ``transcripts`` runs ONCE (a 3-branch
    union would scan + shuffle the events table three times). ``seq`` =
    epoch-millis change order; last-writer-wins materialization gets a
    total order per key.
    """
    t = transcripts(spark, sf_dir).where(F.col("event_id") % 7 != 3)
    return t.select(F.explode(_mysql_event_array()).alias("e")).select(
        "e.op",
        "e.before",
        "e.after",
        F.struct(
            F.lit("transcripts").alias("db"), F.lit("turns").alias("table")
        ).alias("source"),
        "e.seq",
    )


MYSQL_CHANGELOG_SQL = """
WITH t AS ({transcripts} ),
     f AS (SELECT *, (turn_idx < 3 AND event_id % 10 = 7) AS is_hist
           FROM t WHERE event_id % 7 != 3)
SELECT CASE WHEN turn_idx < 3 THEN 'r' ELSE 'c' END AS op,
       CASE WHEN is_hist THEN text END AS before_text,
       CASE WHEN is_hist THEN ts END AS before_ts,
       CASE WHEN is_hist THEN text || ' [edited]' ELSE text END AS after_text,
       conv_id, turn_idx, role, tool,
       CASE WHEN is_hist THEN ts + INTERVAL 60 SECOND ELSE ts END AS ts,
       epoch_ms(ts) AS seq
FROM f
UNION ALL
SELECT 'u', text, ts, text || ' [edited]', conv_id, turn_idx, role, tool, ts,
       epoch_ms(ts) + 60000
FROM f WHERE event_id % 10 = 7 AND turn_idx >= 3
UNION ALL
SELECT 'd',
       CASE WHEN event_id % 10 = 7 THEN text || ' [edited]' ELSE text END, ts,
       NULL, conv_id, turn_idx, role, tool, ts,
       epoch_ms(ts) + 120000
FROM f WHERE event_id % 50 = 13
""".format(transcripts=TRANSCRIPTS_SQL)


def mongo_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mongo-oplog-dialect feed (F3): operationType + fullDocument with
    extended-JSON scalars (`_id.oid`, `create_time.date` epoch millis),
    mirroring UserReviewBehaviorDebeziumDeserializer.java:44-52."""
    t = transcripts(spark, sf_dir).where(F.col("event_id") % 7 == 3)
    return t.select(
        F.lit("INSERT").alias("operationType"),
        F.struct(
            F.struct(
                F.concat(F.col("conv_id"), F.lit("#"), F.col("turn_idx")).alias(
                    "oid"
                )
            ).alias("_id"),
            F.col("conv_id"),
            F.col("turn_idx"),
            F.col("role"),
            F.col("text"),
            F.col("tool"),
            F.struct(F.unix_millis(F.col("ts")).alias("date")).alias(
                "create_time"
            ),
        ).alias("fullDocument"),
    )


MONGO_CHANGELOG_SQL = """
WITH t AS ({transcripts} )
SELECT 'INSERT' AS operationType,
       conv_id || '#' || CAST(turn_idx AS VARCHAR) AS oid,
       conv_id, turn_idx, role, text, tool,
       epoch_ms(ts) AS create_time_ms
FROM t WHERE event_id % 7 = 3
""".format(transcripts=TRANSCRIPTS_SQL)


def _mongo_event_array() -> "F.Column":
    """Single-element ``array<struct<op,before,after,seq>>``: the mongo
    insert row already in COMMON-envelope form — element-for-element
    what ``cdc.normalize_mongo`` produces from :func:`mongo_changelog`
    (op='c', null before, ``after.ts``/``seq`` through the extended-JSON
    epoch-millis round-trip)."""
    seq0 = F.unix_millis(F.col("ts"))
    after = F.struct(
        F.col("conv_id"),
        F.col("turn_idx"),
        F.col("role"),
        F.col("text"),
        F.col("tool"),
        F.timestamp_millis(seq0).alias("ts"),
    )
    return F.array(
        F.struct(
            F.lit("c").alias("op"),
            F.lit(None).cast(_TURN_T).alias("before"),
            after.alias("after"),
            seq0.cast("long").alias("seq"),
        )
    )


def changelog_envelopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both CDC dialects from ONE pass over the transcript table.

    Row-for-row identical (as an unordered multiset) to
    ``cdc.union_feeds(mysql_changelog(...), mongo_changelog(...))`` —
    pinned by ``tests/test_cdc.py`` — but scans and windows the events
    table ONCE. The union form pays the base derivation twice: Spark
    does not dedup common subplans across a union, and the dialect
    filter (``event_id % 7``) cannot push below the ``row_number``
    window, so EACH branch runs scan → hash exchange → sort → window
    over the FULL table. At sf10 (11M envelopes) that double pass is
    the single largest cost in every envelope-fed query. One source
    consumed by all downstream handlers is also the reference's own
    topology (UserBehaviorClickHouseSinkJob.java:66 — one job, two CDC
    streams, shared pipeline).

    ``union_feeds`` and the per-dialect sources remain the U1 surface
    (`cdc_apply_upsert` exercises them end-to-end); this is the scale
    path for the stateless event-derivation queries.
    """
    t = transcripts(spark, sf_dir)
    is_mongo = F.col("event_id") % 7 == 3
    events = F.when(is_mongo, _mongo_event_array()).otherwise(
        _mysql_event_array()
    )
    return t.select(
        is_mongo.alias("_m"), F.explode(events).alias("e")
    ).select(
        "e.op",
        "e.before",
        "e.after",
        F.when(
            F.col("_m"),
            F.struct(
                F.lit("bm-mall").alias("db"), F.lit("review").alias("table")
            ),
        )
        .otherwise(
            F.struct(
                F.lit("transcripts").alias("db"), F.lit("turns").alias("table")
            )
        )
        .alias("source"),
        "e.seq",
        F.when(F.col("_m"), F.lit(10)).cast("int").alias("_kind_override"),
    )
