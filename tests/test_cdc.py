"""Unit tests for CDC derivation quirks (reference-parity semantics) on
hand-built envelopes — the transcript analogs of the D2/D5/D7/D9 quirks
documented in SURVEY.md §2.2."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from flink_cdc_mysql_sink_to_mysql_spark.operators import cdc

TURN = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("role", StringType()),
        StructField("text", StringType()),
        StructField("tool", StringType()),
        StructField("ts", TimestampType()),
    ]
)
ENV = StructType(
    [
        StructField("op", StringType()),
        StructField("before", TURN),
        StructField("after", TURN),
        StructField(
            "source",
            StructType(
                [StructField("db", StringType()), StructField("table", StringType())]
            ),
        ),
        StructField("seq", LongType()),
    ]
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
SRC = ("transcripts", "turns")


def turn(cid="c1", idx=0, role="user", text="hi", tool=None, ts=T0):
    return (cid, idx, role, text, tool, ts)


def env_df(spark, rows):
    return spark.createDataFrame(rows, ENV)


def kinds(df):
    return sorted(
        (r["turn_idx"], r["event_kind"]) for r in df.collect()
    )


def test_insert_emits_role_kind(spark):
    df = env_df(
        spark,
        [
            ("c", None, turn(idx=0, role="user"), SRC, 1),
            ("r", None, turn(idx=1, role="assistant"), SRC, 2),
            ("c", None, turn(idx=2, role="system"), SRC, 3),
        ],
    )
    assert kinds(cdc.derive_turn_events(df)) == [(0, 1), (1, 2), (2, 4)]


def test_tool_turn_multi_emit_pair(spark):
    # D2 analog (ORDER+PAY pair): tool turn with text → tool_turn AND
    # tool_result; with null text → tool_turn only.
    df = env_df(
        spark,
        [
            ("c", None, turn(idx=0, role="tool", text="out", tool="t"), SRC, 1),
            ("c", None, turn(idx=1, role="tool", text=None, tool="t"), SRC, 2),
            # D2 op='u' PAY branch analog: update to a tool turn pairs too
            (
                "u",
                turn(idx=2, role="tool", text="a", tool="t"),
                turn(idx=2, role="tool", text="b", tool="t"),
                SRC,
                3,
            ),
        ],
    )
    assert kinds(cdc.derive_turn_events(df)) == [
        (0, 3),
        (0, 5),
        (1, 3),
        (2, 3),
        (2, 5),
    ]


def test_update_quirk_emits_base_kind_only_on_change(spark):
    # D5 analog: op='u' emits the BASE kind (not an edit kind), and only
    # when text changed (UserBehaviorDebeziumDeserializer.java:244-264).
    before = turn(idx=0, role="user", text="a")
    df = env_df(
        spark,
        [
            ("u", before, turn(idx=0, role="user", text="b"), SRC, 1),
            ("u", before, turn(idx=1, role="user", text="a"), SRC, 2),
        ],
    )
    # row 1 text unchanged vs before → no emit (but turn_idx differs is ok:
    # comparison is on text only, matching the delete_status-only guard)
    out = cdc.derive_turn_events(df)
    assert kinds(out) == [(0, 1)]


def test_delete_and_null_ts_dropped(spark):
    # deletes ignored at derivation (reference never handles op='d');
    # null event-time dropped (D9 swallowed-NPE semantics).
    df = env_df(
        spark,
        [
            ("d", turn(idx=0), None, SRC, 1),
            ("c", None, turn(idx=1, ts=None), SRC, 2),
            ("c", None, turn(idx=2, role="alien"), SRC, 3),  # unknown role (D1)
        ],
    )
    assert cdc.derive_turn_events(df).count() == 0


def test_historical_pair_snapshot_row_emits_two_event_history(spark):
    """D5 historical pair (UserBehaviorDebeziumDeserializer.java:157-192):
    op='r' with a non-null before image emits base-kind @ before.ts +
    turn_edited(6) @ after.ts — two events, two timestamps; a null ts on
    EITHER side drops the whole record (swallowed-NPE covers both)."""
    t1 = T0 + dt.timedelta(minutes=1)
    df = env_df(
        spark,
        [
            (
                "r",
                turn(idx=0, role="user", text="orig", ts=T0),
                turn(idx=0, role="user", text="orig [edited]", ts=t1),
                SRC,
                7,
            ),
            # either timestamp null → record dropped entirely (D9)
            ("r", turn(idx=1, ts=None), turn(idx=1, ts=t1), SRC, 8),
            ("r", turn(idx=2, ts=T0), turn(idx=2, ts=None), SRC, 9),
            # tool hist row: the D2 tool_result pair does NOT fire on the
            # historical branch (the reference's my_collect handler never
            # multi-emits beyond its own pair)
            (
                "r",
                turn(idx=3, role="tool", text="a", tool="t", ts=T0),
                turn(idx=3, role="tool", text="b", tool="t", ts=t1),
                SRC,
                10,
            ),
        ],
    )
    out = cdc.derive_turn_events(df)
    assert kinds(out) == [(0, 1), (0, 6), (3, 3), (3, 6)]
    by = {(r.turn_idx, r.event_kind): r for r in out.collect()}
    assert by[(0, 1)].ts == T0 and by[(0, 1)].metric == 4  # len("orig")
    assert by[(0, 6)].ts == t1 and by[(0, 6)].metric == 13
    assert by[(0, 6)].event_name == "turn_edited"
    assert by[(0, 1)].seq == by[(0, 6)].seq == 7  # one envelope, one seq


def test_pandas_path_equivalence(spark):
    t1 = T0 + dt.timedelta(minutes=1)
    rows = [
        ("c", None, turn(idx=0, role="tool", text="x", tool="t"), SRC, 1),
        ("u", turn(idx=1, text="a"), turn(idx=1, text="b"), SRC, 2),
        ("d", turn(idx=2), None, SRC, 3),
        ("c", None, turn(idx=3, ts=None), SRC, 4),
        ("r", None, turn(idx=4, role="assistant"), SRC, 5),
        # historical pair + its null-ts drop arms
        ("r", turn(idx=5, text="o"), turn(idx=5, text="e", ts=t1), SRC, 6),
        ("r", turn(idx=6, ts=None), turn(idx=6, ts=t1), SRC, 7),
        ("r", turn(idx=7, ts=T0), turn(idx=7, ts=None), SRC, 8),
    ]
    df = env_df(spark, rows)
    a = sorted(map(tuple, cdc.derive_turn_events(df).collect()))
    b = sorted(map(tuple, cdc.derive_turn_events_pandas(df).collect()))
    assert a == b


def test_apply_changelog_lww_and_delete(spark):
    t1, t2 = T0, T0 + dt.timedelta(minutes=1)
    df = env_df(
        spark,
        [
            ("c", None, turn(idx=0, text="v1", ts=t1), SRC, 100),
            ("u", turn(idx=0, text="v1"), turn(idx=0, text="v2", ts=t2), SRC, 200),
            ("c", None, turn(idx=1, text="gone"), SRC, 100),
            ("d", turn(idx=1, text="gone"), None, SRC, 200),
            # same-seq tie: delete outranks insert (binlog-order surrogate)
            ("c", None, turn(idx=2, text="tie"), SRC, 300),
            ("d", turn(idx=2, text="tie"), None, SRC, 300),
        ],
    )
    out = {r["turn_idx"]: r["text"] for r in cdc.apply_changelog(df).collect()}
    assert out == {0: "v2"}


def test_mongo_insert_only_case_insensitive(spark):
    mongo_schema = StructType(
        [
            StructField("operationType", StringType()),
            StructField(
                "fullDocument",
                StructType(
                    [
                        StructField(
                            "_id", StructType([StructField("oid", StringType())])
                        ),
                        StructField("conv_id", StringType()),
                        StructField("turn_idx", IntegerType()),
                        StructField("role", StringType()),
                        StructField("text", StringType()),
                        StructField("tool", StringType()),
                        StructField(
                            "create_time",
                            StructType([StructField("date", LongType())]),
                        ),
                    ]
                ),
            ),
        ]
    )
    doc = (("x",), "c9", 0, "user", "hello", None, (1700000000000,))
    df = spark.createDataFrame(
        [("INSERT", doc), ("Insert", doc), ("update", doc), ("delete", doc)],
        mongo_schema,
    )
    out = cdc.normalize_mongo(df)
    assert out.count() == 2
    row = out.first()
    assert row["op"] == "c" and row["_kind_override"] == 10
    ev = cdc.derive_turn_events(out)
    assert sorted(r["event_kind"] for r in ev.collect()) == [10, 10]


def test_apply_changelog_order_invariant(spark):
    """SURVEY §5.2 item 5: shuffling envelope arrival order leaves the
    materialized table identical (LWW keys on (seq, op-rank), never on
    arrival order)."""
    from flink_cdc_mysql_sink_to_mysql_spark.sources import mysql_changelog

    env = mysql_changelog(spark, "/root/testdata/sf0.001")
    base = sorted(
        map(tuple, cdc.apply_changelog(env).collect())
    )
    # deterministic pseudo-random reorder: sort by a hash of the payload
    shuffled = env.orderBy(F.xxhash64(F.col("seq"), F.col("op")))
    again = sorted(
        map(tuple, cdc.apply_changelog(shuffled).collect())
    )
    assert again == base and len(base) > 0


def test_hist_trigger_keys_on_before_text_not_struct(spark):
    """A snapshot row whose before struct exists but carries NULL text
    is a PLAIN insert (1 event), not a historical pair — the payload
    test, matching the oracle's before_text IS NOT NULL. Both derive
    paths must agree."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    env = spark.createDataFrame(
        [
            (
                "r",
                {"conv_id": "c1", "turn_idx": 0, "role": "user",
                 "text": None, "tool": None, "ts": t0},
                {"conv_id": "c1", "turn_idx": 0, "role": "user",
                 "text": "hello", "tool": None,
                 "ts": t0 + dt.timedelta(minutes=1)},
                1,
            )
        ],
        "op string,"
        " before struct<conv_id:string,turn_idx:int,role:string,"
        "text:string,tool:string,ts:timestamp>,"
        " after struct<conv_id:string,turn_idx:int,role:string,"
        "text:string,tool:string,ts:timestamp>, seq long",
    )
    col_rows = cdc.derive_turn_events(env).collect()
    pd_rows = cdc.derive_turn_events_pandas(env).collect()
    assert len(col_rows) == 1 and col_rows[0]["event_name"] == "user_turn"
    assert sorted(map(tuple, col_rows)) == sorted(map(tuple, pd_rows))


def test_pandas_path_survives_null_turn_idx(spark):
    """Malformed envelope (NULL after.turn_idx, NULL text): the Column
    path emits the event with NULL turn_idx/source_id/metric; the pandas
    path must produce the identical row instead of crashing on the
    int cast (IntCastingNaNError)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    env = spark.createDataFrame(
        [
            (
                "c",
                None,
                {"conv_id": "c9", "turn_idx": None, "role": "user",
                 "text": None, "tool": None, "ts": t0},
                5,
            )
        ],
        "op string,"
        " before struct<conv_id:string,turn_idx:int,role:string,"
        "text:string,tool:string,ts:timestamp>,"
        " after struct<conv_id:string,turn_idx:int,role:string,"
        "text:string,tool:string,ts:timestamp>, seq long",
    )
    col_rows = sorted(map(tuple, cdc.derive_turn_events(env).collect()))
    pd_rows = sorted(map(tuple, cdc.derive_turn_events_pandas(env).collect()))
    assert col_rows == pd_rows
    assert len(col_rows) == 1
    r = cdc.derive_turn_events(env).collect()[0]
    assert r["turn_idx"] is None and r["source_id"] is None
    assert r["metric"] is None


def test_changelog_envelopes_single_pass_equals_union(spark):
    """The one-pass dual-dialect source is row-identical (unordered) to
    union_feeds(mysql_changelog, mongo_changelog) on the driver data —
    the contract that lets the stateless event-derivation queries use
    the single-scan/single-window feed without touching their oracles."""
    from flink_cdc_mysql_sink_to_mysql_spark.sources.transcripts import (
        changelog_envelopes,
        mongo_changelog,
        mysql_changelog,
    )
    from tests.conftest import SF_SMOKE

    u = cdc.union_feeds(
        mysql_changelog(spark, SF_SMOKE), mongo_changelog(spark, SF_SMOKE)
    )
    m = changelog_envelopes(spark, SF_SMOKE)
    assert u.schema == m.schema
    ur = sorted(map(str, u.collect()))
    mr = sorted(map(str, m.collect()))
    assert len(ur) > 0
    assert ur == mr


def test_spooled_envelopes_roundtrip_parity(spark, tmp_path):
    """bench.py --spooled measures operators over a parquet-spooled
    changelog; this pins that the spool round-trip is lossless — the
    derived turn events are row-identical (unordered) to the direct
    single-pass feed, so the spooled timings measure the same work."""
    from flink_cdc_mysql_sink_to_mysql_spark.sources.transcripts import (
        changelog_envelopes,
    )
    from tests.conftest import SF_SMOKE

    direct_env = changelog_envelopes(spark, SF_SMOKE)
    spool = str(tmp_path / "env_spool")
    direct_env.write.mode("overwrite").parquet(spool)
    spooled_env = spark.read.parquet(spool)

    direct = cdc.derive_turn_events(direct_env)
    spooled = cdc.derive_turn_events(spooled_env)
    assert direct.schema == spooled.schema
    dr = sorted(map(str, direct.collect()))
    sr = sorted(map(str, spooled.collect()))
    assert len(dr) > 0
    assert dr == sr

    dm = sorted(map(str, cdc.apply_changelog(direct_env).collect()))
    sm = sorted(map(str, cdc.apply_changelog(spooled_env).collect()))
    assert dm == sm
