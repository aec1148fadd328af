"""Property-based cross-check of the running-sum gaps-and-islands
operators (trace_metrics, repetition_profile) against straight-line
Python references on random inputs — the same SURVEY §5.2 pattern as
the rule-compiler property test. The Spark formulations are
shuffle-minimized rewrites; these tests pin that the optimization
preserved semantics on shapes the hand fixtures don't cover."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flink_cdc_mysql_sink_to_mysql_spark.functions.text import (
    repetition_profile,
)
from flink_cdc_mysql_sink_to_mysql_spark.operators.trace import (
    LOOP_THRESHOLD,
    trace_metrics,
)

roles = st.sampled_from(["user", "assistant", "tool", "system"])
tools = st.sampled_from(["tool_a", "tool_b", "tool_c"])


@st.composite
def conversations(draw):
    n_convs = draw(st.integers(min_value=1, max_value=4))
    rows = []
    for c in range(n_convs):
        n_turns = draw(st.integers(min_value=1, max_value=12))
        for i in range(n_turns):
            role = draw(roles)
            tool = draw(tools) if role == "tool" else None
            rows.append((f"c{c}", i, role, tool))
    return rows


def _trace_reference(rows):
    """Straight-line per-conv fold computing the same metrics."""
    from collections import defaultdict

    by_conv = defaultdict(list)
    for conv_id, idx, role, tool in rows:
        by_conv[conv_id].append((idx, role, tool))
    out = {}
    for conv_id, turns in by_conv.items():
        turns.sort()
        n_tool = sum(1 for _, r, _ in turns if r == "tool")
        chains, runs = [], []
        cur_chain = cur_run = 0
        prev_role = prev_tool = None
        for _, role, tool in turns:
            if role == "tool":
                cur_chain = cur_chain + 1 if prev_role == "tool" else 1
                cur_run = (
                    cur_run + 1
                    if prev_role == "tool" and tool == prev_tool
                    else 1
                )
                if cur_chain == 1:
                    chains.append(0)
                if cur_run == 1:
                    runs.append(0)
                chains[-1] = max(chains[-1], cur_chain)
                runs[-1] = max(runs[-1], cur_run)
            prev_role, prev_tool = role, tool
        max_run = max(runs, default=0)
        out[conv_id] = (
            len(turns),
            n_tool,
            len(chains),
            max(chains, default=0),
            max_run,
            int(max_run >= LOOP_THRESHOLD),
        )
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=conversations())
def test_trace_metrics_matches_reference(spark, rows):
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, tool string"
    )
    got = {
        r["conv_id"]: (
            r["n_turns"],
            r["n_tool_calls"],
            r["n_tool_chains"],
            r["max_tool_chain"],
            r["max_same_tool_run"],
            r["tool_loop"],
        )
        for r in trace_metrics(df).collect()
    }
    assert got == _trace_reference(rows)


words_st = st.lists(
    st.sampled_from(["a", "b", "c", "aa", "xyz"]), min_size=1, max_size=15
)


def _rep_reference(words):
    from collections import Counter

    n = len(words)
    nd = len(set(words))
    bigrams = Counter(zip(words, words[1:]))
    top = max(bigrams.values(), default=0)
    nbg = sum(bigrams.values())
    max_run = run = 1
    for i in range(1, n):
        run = run + 1 if words[i] == words[i - 1] else 1
        max_run = max(max_run, run)
    return (
        n,
        nd,
        (n - nd) * 1000 // n,
        top,
        top * 1000 // nbg if nbg else 0,
        max_run,
    )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(words_st, min_size=1, max_size=5))
def test_repetition_profile_matches_reference(spark, docs):
    df = spark.createDataFrame(
        [(i, " ".join(w)) for i, w in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (
            r["n_words"],
            r["n_distinct_words"],
            r["dup_word_permille"],
            r["top_bigram_n"],
            r["top_bigram_permille"],
            r["max_word_run"],
        )
        for r in repetition_profile(df).collect()
    }
    want = {i: _rep_reference(w) for i, w in enumerate(docs)}
    assert got == want
