"""Property-based cross-check of the changelog LWW materialization —
the engine's core invariant — against a straight-line Python model.

Random envelope sequences (ops c/u/r/d, seq ties, re-deliveries,
null images, interleaved deletes) must materialize identically via:

1. ``cdc.apply_changelog`` (one hash aggregation), and
2. the ``MergeParquetSink`` fed the SAME envelopes split into random
   micro-batches (the streaming path's per-epoch MERGE),

both equal to a dict-based fold applying the documented total order
ord = seq*4 + (d>u>c>r). Arrival order is shuffled per example, so
order-invariance (the exactly-once precondition under replay) is part
of the property, not a separate test.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_cdc_mysql_sink_to_mysql_spark.operators import cdc
from flink_cdc_mysql_sink_to_mysql_spark.streaming.sink import MergeParquetSink

OP_RANK = {"r": 0, "c": 1, "u": 2, "d": 3}
ENVELOPE_DDL = (
    "op string,"
    " before struct<conv_id:string,turn_idx:int,role:string,text:string,"
    "tool:string,ts:timestamp>,"
    " after struct<conv_id:string,turn_idx:int,role:string,text:string,"
    "tool:string,ts:timestamp>,"
    " source struct<db:string,table:string>, seq long"
)
T0 = dt.datetime(2024, 1, 1)


@st.composite
def changelogs(draw):
    """Random envelope list over a small key space so seq ties,
    re-deliveries, and delete/insert races actually happen.

    Contract the generator honors (as a real binlog does): the payload
    is a FUNCTION of (key, seq, op) — the same change position never
    carries two different images, so a full ord tie is always a true
    re-delivery and any winner is the same row. Without that, the LWW
    winner among exact ties is legitimately arbitrary in both engines.
    """
    n = draw(st.integers(min_value=1, max_value=40))
    envs = []
    for i in range(n):
        conv = f"c{draw(st.integers(0, 2))}"
        idx = draw(st.integers(0, 3))
        op = draw(st.sampled_from(["r", "c", "u", "d"]))
        seq = draw(st.integers(0, 5))  # tiny range → frequent ties
        # deterministic in (key, seq, op): ties carry identical payloads
        text = [f"{conv}.{idx}.{op}.{seq}", "", None][(idx + seq) % 3]
        image = (conv, idx, "user", text, None, T0 + dt.timedelta(seconds=seq))
        if op == "d":
            before, after = image, None
        elif op == "u":
            before, after = (conv, idx, "user", "old", None, image[5]), image
        else:
            before, after = None, image
        envs.append((op, before, after, ("db", "t"), seq))
    # re-deliver a random subset (at-least-once upstream)
    redeliver = draw(
        st.lists(st.integers(0, n - 1), min_size=0, max_size=5)
    )
    envs += [envs[i] for i in redeliver]
    # shuffle arrival order
    return draw(st.permutations(envs))


def _model(envs):
    """Dict fold with the documented total order; deletes tombstone."""
    best = {}
    for op, before, after, _, seq in envs:
        image = after if after is not None else before
        key = (image[0], image[1])
        ordv = seq * 4 + OP_RANK[op]
        if key not in best or ordv > best[key][0]:
            best[key] = (ordv, op, after)
    out = {}
    for (conv, idx), (_, op, after) in best.items():
        if op == "d":
            continue
        out[(conv, idx)] = (after[2], after[3], after[4], after[5])
    return out


def _materialized(df):
    return {
        (r["conv_id"], r["turn_idx"]): (
            r["role"],
            r["text"],
            r["tool"],
            r["ts"],
        )
        for r in df.collect()
    }


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(envs=changelogs())
def test_apply_changelog_matches_model(spark, envs):
    df = spark.createDataFrame(envs, ENVELOPE_DDL)
    assert _materialized(cdc.apply_changelog(df)) == _model(envs)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(envs=changelogs(), data=st.data())
def test_merge_sink_matches_model_under_microbatching(
    spark, tmp_path_factory, envs, data
):
    """The SAME random changelog, split at random points into
    'micro-batches', merged epoch by epoch — the streaming path's
    per-epoch view of the world must converge to the batch/model
    answer regardless of where the batch boundaries fall."""
    n_cuts = data.draw(st.integers(min_value=0, max_value=3))
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(0, len(envs)),
                min_size=n_cuts,
                max_size=n_cuts,
            )
        )
    )
    bounds = [0] + cuts + [len(envs)]
    sink = MergeParquetSink(
        str(tmp_path_factory.mktemp("lww-sink")), n_buckets=4
    )
    for epoch, (lo, hi) in enumerate(zip(bounds, bounds[1:])):
        batch = spark.createDataFrame(envs[lo:hi] or [], ENVELOPE_DDL)
        sink.merge_changelog(batch, epoch)
    got = _materialized(
        sink.snapshot(spark).select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    )
    assert got == _model(envs)
