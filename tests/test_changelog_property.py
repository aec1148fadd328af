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


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(envs=changelogs(), data=st.data())
def test_merge_sink_evolves_mid_stream(
    spark, tmp_path_factory, envs, data
):
    """Schema evolution at a RANDOM micro-batch boundary: batches before
    the evolution point merge through a base-schema sink, batches after
    through a reopened sink with an extra image column (rating, a
    deterministic function of the envelope). The final table must
    still equal the LWW model on the base columns, and the evolved
    column must equal the winner's rating when every merge of a
    max-ord envelope happened post-evolution, NULL when every one
    happened pre-evolution (ties straddling the boundary are
    legitimately either — same contract as the generator's payload
    determinism, which rating presence breaks across the boundary)."""

    def rating_of(op, image, seq):
        return (hash((image[0], image[1], op, seq)) % 97) + 1

    def widen(e):
        op, before, after, src, seq = e
        r = rating_of(op, after or before, seq)
        wb = (*before, r) if before is not None else None
        wa = (*after, r) if after is not None else None
        return (op, wb, wa, src, seq)

    wide_ddl = ENVELOPE_DDL.replace(
        "tool:string,ts:timestamp>", "tool:string,ts:timestamp,rating:int>"
    )
    n_cuts = data.draw(st.integers(min_value=1, max_value=3))
    cuts = sorted(
        data.draw(
            st.lists(st.integers(0, len(envs)), min_size=n_cuts, max_size=n_cuts)
        )
    )
    bounds = [0] + cuts + [len(envs)]
    n_epochs = len(bounds) - 1
    evo_epoch = data.draw(st.integers(0, n_epochs - 1))

    root = str(tmp_path_factory.mktemp("evo-sink"))
    base = MergeParquetSink(root, n_buckets=4)
    evolved = MergeParquetSink(root, n_buckets=4, extra_fields={"rating": "int"})
    # track, per key, the epochs at which a max-ord envelope was merged
    for epoch, (lo, hi) in enumerate(zip(bounds, bounds[1:])):
        sink = evolved if epoch >= evo_epoch else base
        rows = [widen(e) for e in envs[lo:hi]] if epoch >= evo_epoch else envs[lo:hi]
        ddl = wide_ddl if epoch >= evo_epoch else ENVELOPE_DDL
        sink.merge_changelog(spark.createDataFrame(rows or [], ddl), epoch)

    snap = evolved.snapshot(spark)
    got_base = _materialized(
        snap.select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    )
    want = _model(envs)
    assert got_base == want

    # rating law per surviving key
    best_ord = {}
    merged_epochs: dict = {}
    for i, (op, before, after, _, seq) in enumerate(envs):
        image = after if after is not None else before
        key = (image[0], image[1])
        ordv = seq * 4 + OP_RANK[op]
        if key not in best_ord or ordv > best_ord[key]:
            best_ord[key] = ordv
    for pos, (op, before, after, _, seq) in enumerate(envs):
        image = after if after is not None else before
        key = (image[0], image[1])
        ordv = seq * 4 + OP_RANK[op]
        if ordv == best_ord[key]:
            epoch = sum(1 for b in bounds[1:-1] if b <= pos)
            merged_epochs.setdefault(key, set()).add(epoch)
    got_rating = {
        (r["conv_id"], r["turn_idx"]): r["rating"] for r in snap.collect()
    }
    for key, (role, text, tool, ts) in want.items():
        eps = merged_epochs[key]
        expected = None
        # find the model winner's rating (any max-ord envelope works —
        # payload-deterministic)
        for op, before, after, _, seq in envs:
            image = after if after is not None else before
            if (image[0], image[1]) == key and seq * 4 + OP_RANK[op] == best_ord[key]:
                expected = rating_of(op, image, seq)
                break
        if all(e >= evo_epoch for e in eps):
            assert got_rating[key] == expected, key
        elif all(e < evo_epoch for e in eps):
            assert got_rating[key] is None, key
        else:
            assert got_rating[key] in (expected, None), key
