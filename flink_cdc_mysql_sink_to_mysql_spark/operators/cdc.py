"""CDC event derivation + changelog materialization.

Re-expresses the reference's per-event "deserializer" logic
(`UserBehaviorDebeziumDeserializer.java` D1–D9 in SURVEY.md §2.2) for the
transcript domain, preserving its structural quirks:

- **multi-emit** (D2 order→ORDER+PAY pair): a tool turn emits BOTH a
  ``tool_turn`` event AND a ``tool_result`` event when text is non-null —
  built as an array of structs + filter + explode (one vectorized pass,
  like the reference's 0–2 rows out per row in).
- **update quirk** (D5 `op='u'` emits the base COLLECT type, NOT
  UN_COLLECT, `UserBehaviorDebeziumDeserializer.java:258-264`): an update
  emits an event typed by the turn's base kind, not an "edit" kind, and
  only when ``before.text != after.text`` (analog of the
  delete_status-changed guard `:244-248`).
- **historical pair** (D5 `op='r'` with delete_status=DELETED emits
  COLLECT@create_time + UN_COLLECT@update_time,
  `UserBehaviorDebeziumDeserializer.java:157-192`): a snapshot row
  whose ``before`` image is non-null carries an edit that pre-dates the
  connector start; it emits its own 2-event history — the base kind at
  ``before.ts`` (original text) plus ``turn_edited`` (kind 6, the
  UN_COLLECT counterpart) at ``after.ts`` (edited text). Either ts null
  → the whole record drops (the reference's swallowed-NPE covers both
  emissions, `:72-74,165,171`).
- **deletes ignored at derivation** (reference never handles op='d'):
  the materialization layer (north rule) handles 'd'; the event stream
  does not.
- **null-timestamp drop** (D9, swallowed-NPE semantics
  `UserBehaviorDebeziumDeserializer.java:72-74`): explicit isNotNull
  filters.
- **unknown role drop** (D1 unknown-topic fallthrough `:44-71`).
- **mongo dialect insert-only, case-insensitive** (D7,
  `UserReviewBehaviorDebeziumDeserializer.java:44`).
- **enum decode** (D8 `UserBehaviorEnum.java:15-24`): kind code → name
  via a literal map column.

Event kinds (transcript analog of behavior_type 1..10):
1=user_turn 2=assistant_turn 3=tool_turn 4=system_turn 5=tool_result
6=turn_edited (historical-pair counterpart, analog of UN_COLLECT bt 7/9)
10=external_turn (mongo feed, analog of COMMENT bt=10).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DecimalType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

ROLE_KIND = {"user": 1, "assistant": 2, "tool": 3, "system": 4}
KIND_NAME = {
    1: "user_turn",
    2: "assistant_turn",
    3: "tool_turn",
    4: "system_turn",
    5: "tool_result",
    6: "turn_edited",
    10: "external_turn",
}

TURN_EVENT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("event_kind", IntegerType()),
        StructField("event_name", StringType()),
        StructField("source_id", StringType()),
        StructField("ts", TimestampType()),
        StructField("seq", LongType()),
        StructField("metric", DecimalType(18, 2)),
    ]
)


def _kind_col(role_col) -> "F.Column":
    m = F.create_map(*[F.lit(x) for kv in ROLE_KIND.items() for x in kv])
    return F.element_at(m, role_col)


def _name_col(kind_col) -> "F.Column":
    m = F.create_map(*[F.lit(x) for kv in KIND_NAME.items() for x in kv])
    return F.element_at(m, kind_col)


def normalize_mongo(
    mongo: DataFrame, extra_image_fields: dict[str, str] | None = None
) -> DataFrame:
    """Mongo-dialect feed → common envelope (op/before/after/seq).

    Only ``operationType='insert'`` (case-insensitive) is consumed — D7
    parity with UserReviewBehaviorDebeziumDeserializer.java:44. The
    extended-JSON scalars are unpacked (`$oid` string id, `$date` epoch
    millis → timestamp, `:48-52`).

    ``extra_image_fields`` widens the emitted envelope images (schema
    evolution): an evolved column is taken from ``fullDocument`` when
    the collection carries it, NULL-filled when only the mysql side
    evolved — so the union of the two dialects stays well-typed.
    """
    from ..streaming.pipeline import image_ddl

    fd = F.col("fullDocument")
    doc_names = set(mongo.schema["fullDocument"].dataType.names)
    extras = [
        (fd[name] if name in doc_names else F.lit(None)).cast(typ).alias(name)
        for name, typ in (extra_image_fields or {}).items()
    ]
    return mongo.where(F.lower(F.col("operationType")) == "insert").select(
        F.lit("c").alias("op"),
        F.lit(None).cast(image_ddl(extra_image_fields)).alias("before"),
        F.struct(
            fd["conv_id"].alias("conv_id"),
            fd["turn_idx"].cast("int").alias("turn_idx"),
            fd["role"].alias("role"),
            fd["text"].alias("text"),
            fd["tool"].alias("tool"),
            F.timestamp_millis(fd["create_time"]["date"]).alias("ts"),
            *extras,
        ).alias("after"),
        F.struct(
            F.lit("bm-mall").alias("db"), F.lit("review").alias("table")
        ).alias("source"),
        fd["create_time"]["date"].alias("seq"),
        F.lit(10).alias("_kind_override"),
    )


def union_feeds(
    mysql_env: DataFrame,
    mongo_env: DataFrame,
    extra_image_fields: dict[str, str] | None = None,
) -> DataFrame:
    """U1: two-stream union (reference `connect` + identity CoMap,
    UserBehaviorClickHouseSinkJob.java:66,103-113) — native unionByName.
    ``extra_image_fields`` must match the mysql feed's evolved image
    schema; the mongo side NULL-fills columns its collection lacks."""
    mysql_env = mysql_env.withColumn("_kind_override", F.lit(None).cast("int"))
    return mysql_env.unionByName(
        normalize_mongo(mongo_env, extra_image_fields)
    )


def derive_turn_events(envelopes: DataFrame) -> DataFrame:
    """D1–D9 analog, pure Column expressions (whole-stage codegen path).

    Input: common envelope (op, before, after, source, seq,
    _kind_override?). Output: TURN_EVENT_SCHEMA rows, 0–2 per envelope.

    Vectorized multi-emit: build array<struct>, filter nulls, explode —
    the Spark-native form of the reference's Collector.collect() called
    0–2 times per record (UserBehaviorDebeziumDeserializer.java:273-369).
    """
    df = envelopes
    if "_kind_override" not in df.columns:
        df = df.withColumn("_kind_override", F.lit(None).cast("int"))

    a = F.col("after")
    b = F.col("before")
    base_kind = F.coalesce(F.col("_kind_override"), _kind_col(a["role"]))

    # D5 historical pair: a snapshot row carrying its own pre-snapshot
    # edit (op='r', before.text non-null — the payload test, matching
    # the oracle's before_text IS NOT NULL; a before struct with NULL
    # text is NOT a historical row) emits a 2-event history instead of
    # one insert event; if EITHER timestamp is null the whole record
    # drops (the reference's per-record NPE swallow covers both
    # emissions, UserBehaviorDebeziumDeserializer.java:72-74,165,171).
    is_hist_row = (F.col("op") == "r") & b["text"].isNotNull()
    emit_hist = is_hist_row & b["ts"].isNotNull() & a["ts"].isNotNull()

    emit_insert = (
        F.col("op").isin("r", "c") & a["ts"].isNotNull() & ~is_hist_row
    )
    # D5-quirk analog: update emits the BASE kind (not an edit kind) and
    # only when the text actually changed (guard :244-248, quirk :258-264).
    emit_update = (
        (F.col("op") == "u")
        & a["ts"].isNotNull()
        & (
            b["text"].isNull()
            | a["text"].isNull()
            | (b["text"] != a["text"])
        )
    )
    # D2-pair analog (ORDER+PAY, incl. the op='u' PAY branch :347-368):
    # tool turns also emit tool_result when text non-null. The mongo feed
    # (kind override) never multi-emits — D7 emits exactly one COMMENT.
    emit_pair = (
        (emit_insert | emit_update)
        & (a["role"] == "tool")
        & a["text"].isNotNull()
        & F.col("_kind_override").isNull()
    )

    known_role = _kind_col(a["role"]).isNotNull() | F.col(
        "_kind_override"
    ).isNotNull()

    def _event(kind_col, when_col, text_col=None, ts_col=None):
        text_col = a["text"] if text_col is None else text_col
        ts_col = a["ts"] if ts_col is None else ts_col
        return F.when(
            when_col & known_role,
            F.struct(
                a["conv_id"].alias("conv_id"),
                a["turn_idx"].cast("int").alias("turn_idx"),
                kind_col.cast("int").alias("event_kind"),
                _name_col(kind_col).alias("event_name"),
                F.concat(
                    a["conv_id"], F.lit("#"), a["turn_idx"].cast("string")
                ).alias("source_id"),
                ts_col.alias("ts"),
                F.col("seq").cast("long").alias("seq"),
                F.length(text_col).cast(DecimalType(18, 2)).alias("metric"),
            ),
        )

    events = F.array(
        _event(base_kind, emit_insert | emit_update),
        _event(F.lit(5), emit_pair),
        # historical pair: base kind @ before (original), turn_edited(6)
        # @ after (edit) — two timestamps, like COLLECT/UN_COLLECT
        _event(base_kind, emit_hist, text_col=b["text"], ts_col=b["ts"]),
        _event(F.lit(6), emit_hist),
    )
    return (
        df.select(F.explode(F.filter(events, lambda e: e.isNotNull())).alias("e"))
        .select("e.*")
    )


def derive_turn_events_pandas(
    envelopes: DataFrame, pre_salt_buckets: int | None = None
) -> DataFrame:
    """Identical semantics via Arrow-batched mapInPandas (the vectorized
    pandas-UDF form the input_hint mandates for deserialization logic).

    Equivalence with :func:`derive_turn_events` is asserted in
    tests/test_cdc.py — this path exists for logic that outgrows Column
    expressions (e.g. tokenizer-grade text munging) and as the scale
    escape hatch; batches arrive as Arrow RecordBatches (zero-copy),
    all ops below are pandas-vectorized, never per-row Python.

    ``pre_salt_buckets`` repartitions the envelopes by salted
    hash(conv_id) first (plans/skew.py) so a hot conversation spreads
    over N Python workers — derivation is stateless, so salting is
    semantics-free here; results are identical (tested).
    """
    if pre_salt_buckets:
        from ..plans.skew import salt_col

        envelopes = envelopes.repartition(
            F.coalesce(F.col("after.conv_id"), F.col("before.conv_id")),
            salt_col(
                F.coalesce(F.col("after.turn_idx"), F.col("before.turn_idx")),
                buckets=pre_salt_buckets,
            ),
        )
    # The kernel never needs the text payloads themselves — only their
    # lengths (metric), null-ness, and a changed? bit for the D5 update
    # guard. Computing those JVM-side keeps the strings OUT of the Arrow
    # transfer: at 110M envelopes the two text columns dominated the
    # batch bytes (the pandas form ran 1.9× the Column path at sf100
    # before this; see BENCH/BASELINE.md §2f).
    b_text, a_text = F.col("before.text"), F.col("after.text")
    flat = envelopes.select(
        "op",
        # payload test, in lockstep with the Column path's is_hist_row
        b_text.isNotNull().alias("has_before"),
        F.length(b_text).cast("long").alias("b_text_len"),
        F.col("before.ts").alias("b_ts"),
        F.col("after.conv_id").alias("conv_id"),
        F.col("after.turn_idx").cast("int").alias("turn_idx"),
        F.col("after.role").alias("role"),
        F.length(a_text).cast("long").alias("text_len"),
        # D5 change guard, exactly the Column path's emit_update predicate
        (b_text.isNull() | a_text.isNull() | (b_text != a_text)).alias(
            "text_changed"
        ),
        F.col("after.ts").alias("ts"),
        F.col("seq").cast("long").alias("seq"),
        (
            F.col("_kind_override")
            if "_kind_override" in envelopes.columns
            else F.lit(None).cast("int")
        ).alias("kind_override"),
    )

    def _derive(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            kind = pdf["role"].map(ROLE_KIND)
            kind = pdf["kind_override"].fillna(kind)
            known = kind.notna() & pdf["ts"].notna()
            hist_row = (pdf["op"] == "r") & pdf["has_before"]
            ins = pdf["op"].isin(["r", "c"]) & known & ~hist_row
            upd = (pdf["op"] == "u") & known & pdf["text_changed"]
            pair = (
                (ins | upd)
                & (pdf["role"] == "tool")
                & pdf["text_len"].notna()
                & pdf["kind_override"].isna()
            )
            # D5 historical pair: both timestamps must exist or the whole
            # record drops (reference swallowed-NPE semantics)
            hist = hist_row & kind.notna() & pdf["b_ts"].notna() & pdf["ts"].notna()

            def mk(
                mask: pd.Series,
                kcol: pd.Series,
                len_col: str = "text_len",
                ts_col: str = "ts",
            ) -> pd.DataFrame:
                s = pdf[mask]
                k = kcol[mask].astype("int64")
                # nullable dtypes + masked concat: the Column path emits
                # NULL turn_idx / source_id / metric for malformed rows
                # (null after.turn_idx, null text); plain astype("int32")
                # would CRASH on NaN instead — the two registered paths
                # share one oracle and must agree row-for-row.
                ti = s["turn_idx"].astype("Int64")
                src = (s["conv_id"] + "#" + ti.astype(str)).mask(
                    ti.isna() | s["conv_id"].isna()
                )
                ln = s[len_col]
                return pd.DataFrame(
                    {
                        "conv_id": s["conv_id"],
                        "turn_idx": ti.astype("Int32"),
                        "event_kind": k.astype("int32"),
                        "event_name": k.map(KIND_NAME),
                        "source_id": src,
                        "ts": s[ts_col],
                        "seq": s["seq"].astype("int64"),
                        "metric": ln.astype("object").where(ln.notna(), None),
                    }
                )

            five = pd.Series(5.0, index=pdf.index)
            six = pd.Series(6.0, index=pdf.index)
            out = pd.concat(
                [
                    mk(ins | upd, kind),
                    mk(pair, five),
                    # base kind @ before.ts (original), kind 6 @ after.ts
                    mk(hist, kind, len_col="b_text_len", ts_col="b_ts"),
                    mk(hist, six),
                ],
                ignore_index=True,
            )
            yield out

    # Arrow float64 → Decimal(18,2) is cast after the UDF (cheap, codegen)
    # so the pandas path never touches python Decimal objects.
    pandas_schema = StructType(
        [
            f if f.name != "metric" else StructField("metric", DoubleType())
            for f in TURN_EVENT_SCHEMA.fields
        ]
    )
    return flat.mapInPandas(_derive, schema=pandas_schema).withColumn(
        "metric", F.col("metric").cast(DecimalType(18, 2))
    )


def op_rank():
    """Seq-tie rank: d > u > c > r (binlog order surrogate)."""
    return (
        F.when(F.col("op") == "d", 3)
        .when(F.col("op") == "u", 2)
        .when(F.col("op") == "c", 1)
        .otherwise(0)
    )


def lww_ord():
    """THE last-writer-wins total order: ord = seq*4 + op_rank.

    Single-sourced here on purpose — the batch materialization below,
    the parquet MERGE shim, and the Iceberg MERGE all compare this exact
    expression; the exactly-once equivalence between them holds only if
    nobody's copy drifts (streaming/sink.py imports these)."""
    return F.col("seq").cast("long") * 4 + op_rank()


def apply_changelog(
    envelopes: DataFrame, extra_image_fields: dict[str, str] | None = None
) -> DataFrame:
    """Keyed last-writer-wins materialization of the changelog → current
    transcript table (the "CDC upsert view", SURVEY.md §4.2).

    For each (conv_id, turn_idx) pick the envelope with max (seq, op-rank)
    via ``max_by`` — a single hash aggregation with map-side partial agg
    (NO window+sort: at 10^12 turns a row_number window would sort every
    partition; max_by shuffles only the combiner output). op='d' winners
    drop the row; otherwise the row is the winner's ``after`` image.

    Tie-break within equal seq: d > u > c > r (a delete at the same seq as
    an insert wins — binlog order surrogate).

    ``extra_image_fields`` (name → DDL type) appends evolved image
    columns (schema evolution — `streaming/pipeline.envelope_ddl`);
    they ride the same winner struct, so LWW applies to them unchanged.
    """
    key_ok = F.col("after").isNotNull() | F.col("before").isNotNull()
    kv = envelopes.where(key_ok).select(
        F.coalesce(F.col("after.conv_id"), F.col("before.conv_id")).alias(
            "conv_id"
        ),
        F.coalesce(F.col("after.turn_idx"), F.col("before.turn_idx"))
        .cast("int")
        .alias("turn_idx"),
        lww_ord().alias("ord"),
        F.struct(F.col("op"), F.col("after")).alias("payload"),
    )
    winners = kv.groupBy("conv_id", "turn_idx").agg(
        F.max_by("payload", "ord").alias("w")
    )
    extras = [
        F.col(f"w.after.{name}").cast(typ).alias(name)
        for name, typ in (extra_image_fields or {}).items()
    ]
    return winners.where(F.col("w.op") != "d").select(
        "conv_id",
        "turn_idx",
        F.col("w.after.role").alias("role"),
        F.col("w.after.text").alias("text"),
        F.col("w.after.tool").alias("tool"),
        F.col("w.after.ts").alias("ts"),
        *extras,
    )


def sink_rows(turn_events: DataFrame) -> DataFrame:
    """F4 sink projection — parity with the reference's 8-column JDBC
    insert (UserBehaviorClickHouseSinkJob.java:68-82):

    - event_time rendered at +08:00, second precision, as string (`:77`)
    - null secondary key coalesced to -1 (`:72-74`) — here a nullable
      per-event shard extracted from the metric
    - natural identity = (source_id, event_kind) (dedup key the reference
      delegates to the ClickHouse engine; our MERGE key).
    """
    return turn_events.select(
        "conv_id",
        "turn_idx",
        "event_kind",
        "event_name",
        "source_id",
        F.date_format(
            F.from_utc_timestamp(F.col("ts"), "+08:00"), "yyyy-MM-dd HH:mm:ss"
        ).alias("event_time_str"),
        F.coalesce(F.col("metric"), F.lit(-1).cast(DecimalType(18, 2))).alias(
            "metric"
        ),
        F.pmod(F.xxhash64(F.col("conv_id")), F.lit(32))
        .cast("int")
        .alias("partition_id"),
    )
