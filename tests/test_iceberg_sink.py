"""Iceberg MERGE sink coverage without the Iceberg runtime.

No Iceberg jars exist in-sandbox (offline), so the real `MERGE INTO`
can't execute here — instead:

1. a golden-text test pins the statement's clause shape (ord guard,
   tombstone updates, no DELETE arm — the round-1 advisor's findings);
2. the per-batch LWW reduction is asserted to be the SAME function the
   tested parquet shim uses;
3. `emulate_merge` — a full-outer-join DataFrame transcription of the
   WHEN clauses (structurally unlike the shim's union+groupBy) — is
   executed across multi-epoch, seq-tie, and out-of-order-replay
   scenarios and asserted row-identical to the shim's table.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from flink_cdc_mysql_sink_to_mysql_spark.streaming import iceberg, sink as sink_mod
from flink_cdc_mysql_sink_to_mysql_spark.streaming import pipeline as pl
from flink_cdc_mysql_sink_to_mysql_spark.streaming.iceberg import (
    MERGE_COLS,
    IcebergMergeSink,
    emulate_merge,
)
from flink_cdc_mysql_sink_to_mysql_spark.streaming.sink import (
    MergeParquetSink,
    lww_delta,
)

T0 = dt.datetime(2024, 1, 1)


def env_df(spark, rows):
    """rows: (op, conv_id, turn_idx, role, text, seq)."""
    data = [
        (
            op,
            None,
            (cid, idx, role, text, None, T0 + dt.timedelta(seconds=seq)),
            ("transcripts", "turns"),
            seq,
        )
        for (op, cid, idx, role, text, seq) in rows
    ]
    return spark.createDataFrame(data, pl.ENVELOPE_DDL)


def test_merge_sql_golden():
    sql = IcebergMergeSink(table="cdc.db.turns").merge_sql("_delta_0")
    # cross-batch LWW must compare ord (seq + op-rank), not bare seq:
    # a delete tying a stored insert on seq must still win
    assert "s.ord > t.ord" in sql
    assert "s.seq" not in sql
    # deletes stay as op='d' tombstone rows — a MATCHED DELETE arm would
    # let a replayed older insert resurrect the key via NOT MATCHED
    assert "DELETE" not in sql
    assert "WHEN MATCHED AND s.ord > t.ord THEN UPDATE SET *" in sql
    assert "WHEN NOT MATCHED THEN INSERT *" in sql
    assert "t.conv_id = s.conv_id" in sql and "t.turn_idx = s.turn_idx" in sql
    # the stored table carries ord so the guard has something to compare
    assert "ord bigint" in IcebergMergeSink.DDL


def test_reduction_shared_with_shim():
    """Both sinks reduce micro-batches through the same code object."""
    assert iceberg.lww_delta is sink_mod.lww_delta


def test_lww_delta_seq_tie_and_tombstone(spark):
    batch = env_df(
        spark,
        [
            ("c", "a", 0, "user", "v1", 5),
            ("d", "a", 0, None, None, 5),  # same seq — delete must win
            ("u", "b", 1, "user", "v2", 3),
            ("u", "b", 1, "user", "v3", 4),
        ],
    )
    out = {(r.conv_id, r.turn_idx): r for r in lww_delta(batch).collect()}
    assert out[("a", 0)].op == "d"  # tombstone KEPT in the merge source
    assert out[("a", 0)].ord == 5 * 4 + 3
    assert out[("b", 1)].text == "v3"
    assert len(out) == 2  # key-unique (Iceberg rejects dup source keys)


def _shim_rows(spark, shim):
    return sorted(
        map(tuple, shim.read(spark).select(*MERGE_COLS).collect())
    )


def _emul_rows(table):
    return sorted(map(tuple, table.select(*MERGE_COLS).collect()))


def test_emulated_merge_matches_shim_across_epochs(spark, tmp_path):
    """Replay a 4-epoch changelog — including a seq-tie delete, an
    out-of-order older epoch re-applied late, and an older insert
    arriving after a delete — through BOTH the parquet shim and the
    MERGE-clause emulation; tables must be identical (incl. tombstones)."""
    epochs = [
        env_df(
            spark,
            [
                ("c", "a", 0, "user", "v1", 10),
                ("c", "b", 0, "user", "w1", 11),
            ],
        ),
        env_df(
            spark,
            [
                ("u", "a", 0, "user", "v2", 20),
                ("d", "b", 0, None, None, 11),  # seq tie with stored insert
            ],
        ),
        # out-of-order: an OLDER update replayed after newer state, plus
        # an older insert for the deleted key b — must NOT resurrect it
        env_df(
            spark,
            [
                ("u", "a", 0, "user", "stale", 15),
                ("c", "b", 0, "user", "zombie", 9),
            ],
        ),
        env_df(spark, [("c", "c", 7, "tool", "t1", 30)]),
    ]

    shim = MergeParquetSink(str(tmp_path / "t"), n_buckets=8)
    table = spark.createDataFrame([], ", ".join(
        f"{c} {t}" for c, t in [
            ("conv_id", "string"), ("turn_idx", "int"), ("role", "string"),
            ("text", "string"), ("tool", "string"), ("ts", "timestamp"),
            ("seq", "long"), ("op", "string"), ("ord", "long"),
        ]
    ))
    for eid, batch in enumerate(epochs):
        shim.merge_changelog(batch, epoch_id=eid)
        table = emulate_merge(table, lww_delta(batch)).localCheckpoint()

    assert _shim_rows(spark, shim) == _emul_rows(table)
    live = {r.conv_id for r in table.where(F.col("op") != "d").collect()}
    assert live == {"a", "c"}  # b stays tombstoned despite the zombie insert
    a = table.where(F.col("conv_id") == "a").collect()[0]
    assert a.text == "v2"  # stale out-of-order update lost on ord


def test_iceberg_merge_changelog_needs_runtime(spark, tmp_path):
    """Without catalog jars the real path fails fast at ensure_table —
    the config-selected gate (iceberg_available) stays False."""
    assert iceberg.iceberg_available(spark) is False
    s = IcebergMergeSink(table="cdc.db.turns")
    with pytest.raises(Exception):
        s.merge_changelog(env_df(spark, [("c", "a", 0, "user", "x", 1)]), 0)
