"""Semantics pins for the round-2 curation operators: agent tool-chain
trace metrics (gaps-and-islands), Gopher-style repetition profile, and
benchmark n-gram decontamination. Hand-built fixtures with worked-out
expected values; cross-engine exactness is covered by
test_oracle_parity.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_cdc_mysql_sink_to_mysql_spark.functions.text import (
    repetition_profile,
)
from flink_cdc_mysql_sink_to_mysql_spark.operators.decontam import (
    EVAL_MOD,
    EVAL_RES,
    decontaminate,
)
from flink_cdc_mysql_sink_to_mysql_spark.operators.trace import trace_metrics


def _turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, tool string"
    )


def test_trace_chains_and_loops(spark):
    rows = [
        # c1: user, tool,tool,tool (same tool -> loop), assistant, tool
        ("c1", 0, "user", None),
        ("c1", 1, "tool", "tool_a"),
        ("c1", 2, "tool", "tool_a"),
        ("c1", 3, "tool", "tool_a"),
        ("c1", 4, "assistant", None),
        ("c1", 5, "tool", "tool_b"),
        # c2: alternating tools in ONE chain — chain len 4, same-tool runs 1
        ("c2", 0, "tool", "tool_a"),
        ("c2", 1, "tool", "tool_b"),
        ("c2", 2, "tool", "tool_a"),
        ("c2", 3, "tool", "tool_b"),
        # c3: no tool turns at all
        ("c3", 0, "user", None),
        ("c3", 1, "assistant", None),
    ]
    out = {
        r["conv_id"]: r
        for r in trace_metrics(_turns(spark, rows)).collect()
    }
    c1 = out["c1"]
    assert (c1.n_turns, c1.n_tool_calls) == (6, 4)
    assert (c1.n_tool_chains, c1.max_tool_chain) == (2, 3)
    assert (c1.max_same_tool_run, c1.tool_loop) == (3, 1)
    c2 = out["c2"]
    assert (c2.n_tool_chains, c2.max_tool_chain) == (1, 4)
    # alternation breaks the same-tool runs even inside one chain
    assert (c2.max_same_tool_run, c2.tool_loop) == (1, 0)
    c3 = out["c3"]
    assert (c3.n_tool_calls, c3.n_tool_chains, c3.max_tool_chain) == (0, 0, 0)
    assert (c3.max_same_tool_run, c3.tool_loop) == (0, 0)


def test_trace_nonadjacent_tools_are_separate_chains(spark):
    rows = [
        ("c1", 0, "tool", "tool_a"),
        ("c1", 1, "user", None),
        ("c1", 2, "tool", "tool_a"),
    ]
    r = trace_metrics(_turns(spark, rows)).collect()[0]
    assert (r.n_tool_chains, r.max_tool_chain) == (2, 1)
    # the same tool split by a user turn is NOT a consecutive run
    assert r.max_same_tool_run == 1


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_profile_values(spark):
    out = {
        r["doc_id"]: r
        for r in repetition_profile(
            _docs(
                spark,
                [
                    (1, "a a a b"),  # run of 3 a's; bigram 'a a' twice
                    (2, "x y z"),  # no repetition
                    (3, "w"),  # single word: no bigrams
                ],
            )
        ).collect()
    }
    d1 = out[1]
    assert (d1.n_words, d1.n_distinct_words) == (4, 2)
    assert d1.dup_word_permille == 500
    assert (d1.top_bigram_n, d1.top_bigram_permille) == (2, 666)  # 2/3
    assert d1.max_word_run == 3
    d2 = out[2]
    assert (d2.dup_word_permille, d2.top_bigram_n, d2.max_word_run) == (0, 1, 1)
    d3 = out[3]
    assert (d3.n_words, d3.top_bigram_n, d3.top_bigram_permille) == (1, 0, 0)
    assert d3.max_word_run == 1


def test_decontaminate_flags_copied_ngram(spark):
    eval_id = EVAL_RES  # doc_id=3 satisfies the eval predicate
    assert eval_id % EVAL_MOD == EVAL_RES
    docs = _docs(
        spark,
        [
            (eval_id, "alpha beta gamma delta"),
            # copies the eval doc's 'beta gamma delta' trigram
            (10, "zzz beta gamma delta qqq"),
            # no shared trigram
            (11, "one two three four"),
            # too short for any trigram overlap accounting
            (12, "beta gamma"),
        ],
    )
    out = {r["doc_id"]: r for r in decontaminate(docs).collect()}
    assert eval_id not in out  # eval docs are excluded from the output
    # shared trigrams: only 'beta gamma delta' ('zzz beta gamma' and
    # 'gamma delta qqq' don't appear in the eval doc)
    assert (out[10].n_overlap, out[10].contaminated) == (1, 1)
    assert (out[11].n_overlap, out[11].contaminated) == (0, 0)
    assert (out[12].n_overlap, out[12].contaminated) == (0, 0)


def test_decontaminate_counts_distinct_overlap_once(spark):
    docs = _docs(
        spark,
        [
            (EVAL_RES, "p q r"),
            (20, "p q r p q r p q r"),  # same trigram repeated
        ],
    )
    out = {r["doc_id"]: r for r in decontaminate(docs).collect()}
    # distinct shared grams: 'p q r', 'q r p', 'r p q' appear in doc 20,
    # but only 'p q r' exists in the eval set -> n_overlap counts it ONCE
    assert out[20].n_overlap == 1


def test_conversation_quality_gate(spark):
    import datetime as dt

    from flink_cdc_mysql_sink_to_mysql_spark.operators.convquality import (
        conversation_quality,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # good: user -> assistant, reasonable lengths
        ("g", 0, "user", "hello there friend", None, t0),
        ("g", 1, "assistant", "hi, how can I help", None, t0),
        # truncated: ends on a user turn
        ("t", 0, "user", "hello hello hello", None, t0),
        ("t", 1, "assistant", "response response", None, t0),
        ("t", 2, "user", "follow-up question", None, t0),
        # monologue: no user turn at all
        ("m", 0, "assistant", "talking to myself at length", None, t0),
        ("m", 1, "assistant", "still going on and on", None, t0),
        # stub: single turn
        ("s", 0, "user", "hi", None, t0),
        # degenerate: too-short average turn text
        ("d", 0, "user", "a", None, t0),
        ("d", 1, "assistant", "b", None, t0),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )
    out = {r["conv_id"]: r for r in conversation_quality(df).collect()}
    assert out["g"].keep == 1
    assert out["t"].keep == 0 and out["t"].ends_with_assistant == 0
    assert out["m"].keep == 0 and out["m"].n_user == 0
    assert out["s"].keep == 0 and out["s"].n_turns == 1
    assert out["d"].keep == 0 and out["d"].avg_turn_chars == 1
    assert out["g"].user_share_permille == 500


def test_conversation_dup_groups(spark):
    import datetime as dt

    from flink_cdc_mysql_sink_to_mysql_spark.operators.dedup import (
        conversation_dup_groups,
        conversation_fingerprints,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # a and c are identical transcripts; b differs in one text
        ("a", 0, "user", "hi", None, t0),
        ("a", 1, "assistant", "hello", None, t0),
        ("c", 0, "user", "hi", None, t0),
        ("c", 1, "assistant", "hello", None, t0),
        ("b", 0, "user", "hi", None, t0),
        ("b", 1, "assistant", "HELLO", None, t0),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )
    fps = {r["conv_id"]: r["conv_fp"] for r in conversation_fingerprints(df).collect()}
    assert fps["a"] == fps["c"] != fps["b"]
    groups = conversation_dup_groups(df).collect()
    assert len(groups) == 1
    assert groups[0]["n_convs"] == 2 and groups[0]["canonical_conv_id"] == "a"


def test_conversation_fingerprint_is_shuffle_order_invariant(spark):
    import datetime as dt

    from flink_cdc_mysql_sink_to_mysql_spark.operators.dedup import (
        conversation_fingerprints,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [("x", i, "user", f"t{i}", None, t0) for i in range(20)]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )
    a = conversation_fingerprints(df.repartition(8)).collect()[0]["conv_fp"]
    b = conversation_fingerprints(df.orderBy(F.desc("turn_idx"))).collect()[0][
        "conv_fp"
    ]
    assert a == b  # array_sort makes the fold input deterministic
