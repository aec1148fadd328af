"""Upsert/delete-aware windowed aggregates (streaming/ivm.py).

The maintained view must retract: an update that MOVES a turn across a
window boundary shifts a count between windows; a delete removes one;
an emptied conversation disappears from the view entirely. The
append-mode event-counting stream (pipeline.windowed_counts_stream)
cannot do any of that — this is the changelog-correct twin.
"""

from __future__ import annotations

import datetime as dt

import duckdb
from pyspark.sql import functions as F

from flink_cdc_mysql_sink_to_mysql_spark.sources import mysql_changelog
from flink_cdc_mysql_sink_to_mysql_spark.sources.transcripts import (
    MYSQL_CHANGELOG_SQL,
)
from flink_cdc_mysql_sink_to_mysql_spark.streaming import pipeline as pl
from flink_cdc_mysql_sink_to_mysql_spark.streaming.ivm import (
    GroupedReplaceParquetSink,
    windowed_state_batch,
    windowed_state_stream,
)
from flink_cdc_mysql_sink_to_mysql_spark.streaming.sink import MergeParquetSink
from tests.conftest import SF_SMOKE, register_views
from tests.util import assert_same

ENVELOPE_DDL = (
    "op string,"
    " before struct<conv_id:string,turn_idx:int,role:string,text:string,"
    "tool:string,ts:timestamp>,"
    " after struct<conv_id:string,turn_idx:int,role:string,text:string,"
    "tool:string,ts:timestamp>,"
    " source struct<db:string,table:string>, seq long"
)

T = dt.datetime(2024, 6, 1, 10, 0, 0)


def _crafted(spark):
    """Envelopes exercising exactly what append-mode windows get wrong:
    a cross-window ts move, a delete, and a fully-emptied conv."""
    s = ("db", "t")

    def turn(conv, idx, ts):
        return (conv, idx, "user", f"{conv}.{idx}", None, ts)

    rows = [
        # mv: turn inserted in window [10:00,10:10), then MOVED to [10:20,10:30)
        ("c", None, turn("mv", 1, T), s, 1),
        ("u", turn("mv", 1, T), turn("mv", 1, T + dt.timedelta(minutes=22)), s, 2),
        # mv keeps a second, unmoved turn in the first window
        ("c", None, turn("mv", 2, T + dt.timedelta(minutes=1)), s, 1),
        # del1: insert then delete one of two turns
        ("c", None, turn("del1", 1, T), s, 1),
        ("c", None, turn("del1", 2, T + dt.timedelta(minutes=2)), s, 1),
        ("d", turn("del1", 1, T), None, s, 3),
        # gone: conversation fully deleted → must vanish from the view
        ("c", None, turn("gone", 1, T), s, 1),
        ("d", turn("gone", 1, T), None, s, 2),
    ]
    return spark.createDataFrame(rows, ENVELOPE_DDL)


def _view_ms(df):
    return df.select(
        "conv_id",
        F.unix_millis("win_start").alias("win_start_ms"),
        F.unix_millis("win_end").alias("win_end_ms"),
        "n_turns",
    )


def _run(spark, env, tmp_path, n_chunks=3, window="10 minutes"):
    spool = str(tmp_path / "spool")
    pl.spool_changelog(env, spool, n_chunks=n_chunks)
    state = MergeParquetSink(str(tmp_path / "state"), n_buckets=8)
    view = GroupedReplaceParquetSink(str(tmp_path / "view"), n_buckets=8)
    windowed_state_stream(
        spark, spool, state, view, str(tmp_path / "ckpt"), window=window
    )
    return state, view


def test_view_retracts_moves_and_deletes(spark, tmp_path):
    env = _crafted(spark)
    _, view = _run(spark, env, tmp_path, n_chunks=2)
    got = {
        (r["conv_id"], r["win_start_ms"]): r["n_turns"]
        for r in _view_ms(view.read_view(spark)).collect()
    }
    t0 = int(T.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
    min10 = 600_000
    assert got == {
        ("mv", t0): 1,           # turn 1 retracted (moved out), turn 2 stays
        ("mv", t0 + 2 * min10): 1,  # turn 1 landed two windows later
        ("del1", t0): 1,         # one of two turns deleted
    }
    # "gone" is absent entirely — its group was replaced with zero rows


def test_view_matches_batch_twin_on_changelog(spark, tmp_path):
    env = mysql_changelog(spark, SF_SMOKE).unionByName(_crafted(spark))
    _, view = _run(spark, env, tmp_path, n_chunks=4)
    assert_same(
        _view_ms(view.read_view(spark)),
        _view_ms(windowed_state_batch(env)).toPandas(),
        "ivm vs batch twin",
    )


def test_view_matches_duckdb_oracle(spark, tmp_path):
    """Independent engine check on the pure sf0.001 feed: the
    maintained view == DuckDB's window counts over the LWW state."""
    env = mysql_changelog(spark, SF_SMOKE)
    _, view = _run(spark, env, tmp_path)
    con = duckdb.connect()
    register_views(con, SF_SMOKE)
    oracle = con.sql(
        f"""
        WITH my AS ({MYSQL_CHANGELOG_SQL}),
        env AS (
          SELECT op, conv_id, turn_idx, ts, seq,
                 CASE op WHEN 'd' THEN 3 WHEN 'u' THEN 2
                         WHEN 'c' THEN 1 ELSE 0 END AS op_rank
          FROM my
        ),
        w AS (
          SELECT conv_id, turn_idx,
                 max_by(op, seq * 4 + op_rank) AS op,
                 max_by(epoch_ms(ts), seq * 4 + op_rank) AS ts_ms
          FROM env GROUP BY conv_id, turn_idx
        ),
        live AS (SELECT conv_id, ts_ms FROM w WHERE op != 'd')
        SELECT conv_id,
               CAST(floor(ts_ms / 600000) AS BIGINT) * 600000 AS win_start_ms,
               CAST(floor(ts_ms / 600000) AS BIGINT) * 600000 + 600000
                 AS win_end_ms,
               COUNT(*) AS n_turns
        FROM live GROUP BY 1, 2, 3
        """
    ).df()
    assert_same(_view_ms(view.read_view(spark)), oracle, "ivm vs duckdb")


def test_replay_and_partial_commit_converge(spark, tmp_path):
    env = mysql_changelog(spark, SF_SMOKE).unionByName(_crafted(spark))
    expected = _view_ms(windowed_state_batch(env)).toPandas()

    # partial commit: the STATE sink already holds epoch 0 (crash hit
    # between the state commit and the view commit) — the stream must
    # replay epoch 0 as a state-skip + view-commit
    spool = str(tmp_path / "spool")
    paths = pl.spool_changelog(env, spool, n_chunks=3)
    state = MergeParquetSink(str(tmp_path / "state"), n_buckets=8)
    view = GroupedReplaceParquetSink(str(tmp_path / "view"), n_buckets=8)
    first = spark.read.schema(ENVELOPE_DDL).parquet(paths[0])
    state.merge_changelog(first, 0)

    windowed_state_stream(
        spark, spool, state, view, str(tmp_path / "ckpt")
    )
    assert_same(_view_ms(view.read_view(spark)), expected, "partial commit")

    # full replay through a fresh checkpoint: both sinks epoch-skip
    windowed_state_stream(
        spark, spool, state, view, str(tmp_path / "ckpt2")
    )
    assert_same(_view_ms(view.read_view(spark)), expected, "full replay")
