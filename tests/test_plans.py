"""Plan-quality regression tests: the physical plans that make these
operators scale must not silently degrade (column pruning, broadcast
strategy, map-side partial aggregation)."""

from __future__ import annotations

import pytest

from flink_cdc_mysql_sink_to_mysql_spark import entry_queries
from tests.conftest import SF_CORRECT


@pytest.fixture(autouse=True)
def _no_split_repair(spark):
    """Plan tests pin the AT-SCALE plan shape. On a real (many-file)
    table the degenerate-split repair in session.read_parquet_repaired
    is a structural no-op, but the single-row-group testdata would
    trigger it and add a load-time Exchange to every docs/emb query —
    disable it here; test_split_repair_* below pin the repair itself."""
    spark.conf.set("spark.cdcengine.splitRepair", "false")
    yield
    spark.conf.set("spark.cdcengine.splitRepair", "true")


def _plan(spark, name: str) -> str:
    # same resolution as bench.py: registry first, then the plain
    # q_<name> function (ops rotated out of the 50-slot driver window
    # keep their plan pins here)
    fn = entry_queries.queries().get(name) or getattr(
        entry_queries, f"q_{name}"
    )
    df = fn(spark, SF_CORRECT)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_split_repair_fires_on_degenerate_layout(spark):
    """The testdata tables are one file / one row group — unsplittable,
    so a narrow pipeline would run its whole scan stage on ONE core at
    any cluster size. The loader must repartition on the key."""
    from flink_cdc_mysql_sink_to_mysql_spark.session import (
        read_parquet_repaired,
    )

    spark.conf.set("spark.cdcengine.splitRepair", "true")
    # sf0.01 documents = 500 rows; rows_per_task=100 → 5-way target
    # (row-count-aware: a tiny table must NOT shatter into `cores`
    # near-empty tasks — the production default is 2048 rows/task)
    df = read_parquet_repaired(
        spark, f"{SF_CORRECT}/documents.parquet", "doc_id", rows_per_task=100
    )
    assert df.rdd.getNumPartitions() == 5
    plan = df._jdf.queryExecution().executedPlan().toString()
    # key-hash partitioning, NOT round-robin (which adds a local sort)
    assert "hashpartitioning(doc_id" in plan
    # identical rows, only the partitioning differs
    raw = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    assert df.count() == raw.count()


def test_split_repair_noop_when_disabled(spark):
    from flink_cdc_mysql_sink_to_mysql_spark.session import (
        read_parquet_repaired,
    )

    df = read_parquet_repaired(
        spark, f"{SF_CORRECT}/documents.parquet", "doc_id"
    )
    assert "Exchange" not in df._jdf.queryExecution().executedPlan().toString()


def test_text_profile_scan_prunes_columns(spark):
    """The profile reads 2 of 5 document columns — the scan must too."""
    plan = _plan(spark, "text_profile")
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_cosine_topk_broadcasts_query_side(spark):
    """Query vectors are tiny — a shuffle join here would ship the
    whole corpus; the plan must broadcast."""
    plan = _plan(spark, "ann_cosine_topk")
    assert "BroadcastExchange" in plan or "BroadcastNestedLoop" in plan


def test_cdc_apply_uses_partial_aggregation(spark):
    """LWW materialization must partial-aggregate before its exchange.

    max_by over a struct payload plans as SortAggregate (struct agg
    buffers aren't hash-agg compatible) — what matters is the
    partial → Exchange → final shape, whatever the aggregate impl.
    """
    plan = _plan(spark, "cdc_apply_upsert")
    import re

    aggs = [
        m.start()
        for m in re.finditer(r"(Sort|ObjectHash|Hash)Aggregate", plan)
    ]
    assert len(aggs) >= 2, "expected partial+final aggregate pair"


def test_cohort_anti_join_is_anti(spark):
    plan = _plan(spark, "cohort_not_exist")
    assert "LeftAnti" in plan


def test_events_scan_prunes_for_window_query(spark):
    """Tumbling counts need (user_id, event_type, props, ts, event_id)
    from events — but must NOT read the value/... columns it ignores."""
    plan = _plan(spark, "window_tumbling")
    read = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read and all("value" not in l for l in read)


def test_pack_sequences_scan_prunes_and_single_shuffle(spark):
    """Packing reads 3 of 5 document columns and shuffles ONCE (the
    (lang, shard) window partition) — a second exchange would mean the
    cumsum is re-partitioned wastefully."""
    plan = _plan(spark, "pack_sequences")
    assert "ReadSchema: struct<doc_id:bigint,text:string,lang:string>" in plan
    import re

    # one node header "(N) Exchange" in the formatted detail section
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1


def test_sample_stratified_is_narrow(spark):
    """Deterministic hash sampling must be a pure scan→project→filter:
    zero exchanges, zero aggregates."""
    plan = _plan(spark, "sample_stratified")
    assert "Exchange" not in plan
    assert "Aggregate" not in plan


def test_asof_join_is_one_window_pass_not_range_join(spark):
    """The as-of composition must plan as union → window (one sort per
    key partition), NOT a join — a range/theta join here explodes to
    O(|a|·|u|) pairs per conversation."""
    plan = _plan(spark, "join_asof_prev_user")
    assert "Window" in plan
    for bad in ("SortMergeJoin", "BroadcastNestedLoop", "CartesianProduct"):
        assert bad not in plan


def test_sample_topk_plans_window_group_limit(spark):
    """rn<=k must push a per-partition top-k (WindowGroupLimit) below
    the exchange — otherwise every stratum ships in full to one task."""
    plan = _plan(spark, "sample_topk")
    assert "WindowGroupLimit" in plan


def test_trace_metrics_is_single_conv_exchange(spark):
    """The running-sum gaps-and-islands formulation must shuffle at most
    twice (source row_number on user_id + the conv_id window — the
    former vanishes on a conv-bucketed table); the three metric levels
    all reuse the conv_id clustering. The branchy draft cost 6."""
    plan = _plan(spark, "trace_tool_chains")
    assert plan.count("Exchange hashpartitioning") <= 2


def test_repetition_profile_is_shuffle_free(spark):
    """Per-doc metrics over bounded word arrays must plan as ONE narrow
    projection (array HOFs) — no exchange, no explode-and-regroup: the
    round-2 window formulation's doc_id shuffle was the slowest
    extended query at sf10."""
    plan = _plan(spark, "text_repetition")
    assert "Exchange" not in plan
    assert "Generate" not in plan  # no explode


def test_decontam_broadcasts_eval_side(spark):
    """The eval n-gram set is O(1)-bounded by construction and must plan
    as a broadcast join — a shuffle join here would ship the full corpus
    n-gram stream."""
    plan = _plan(spark, "decontam_ngram_overlap")
    assert "BroadcastHashJoin" in plan
    for bad in ("BroadcastNestedLoop", "CartesianProduct"):
        assert bad not in plan


def test_vocab_top_terms_is_heap_topk_not_global_sort(spark):
    """Global top-k must plan as TakeOrderedAndProject (per-partition
    k-row heap + driver merge) over a partially-aggregated term count —
    a global Sort here would shuffle the whole vocabulary."""
    plan = _plan(spark, "vocab_top_terms")
    assert "TakeOrderedAndProject" in plan


def _plan_of(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_vocab_rank_quality_broadcasts_vocab(spark):
    """The top-v vocabulary is O(1) by construction and must plan as a
    broadcast join — a shuffle join would re-exchange the full token
    stream on the term key."""
    from flink_cdc_mysql_sink_to_mysql_spark import entry_queries as eq

    plan = _plan_of(spark, eq.q_vocab_rank_quality(spark, SF_CORRECT))
    assert "BroadcastHashJoin" in plan
    for bad in ("BroadcastNestedLoop", "CartesianProduct"):
        assert bad not in plan


def test_substring_containment_joins_on_anchor_keys(spark):
    """The candidate join must be an equi-join on the md5 anchor key —
    never a cartesian/nested-loop pass over doc pairs — and the verify
    joins must stay id-keyed."""
    from flink_cdc_mysql_sink_to_mysql_spark import entry_queries as eq

    plan = _plan_of(spark, eq.q_dedup_substring(spark, SF_CORRECT))
    for bad in ("BroadcastNestedLoop", "CartesianProduct"):
        assert bad not in plan


def test_json_front_door_parses_once(spark):
    """The wire-format parse must evaluate from_json exactly ONCE per
    line. Catalyst's per-field JSON schema pruning otherwise clones the
    parse per consumed field (6x tokenization of every line — measured
    ~3x slower ingest at sf10); the Generate barrier in
    parse_envelope_lines pins it to one full parse and no shuffle."""
    from flink_cdc_mysql_sink_to_mysql_spark.operators import cdc
    from flink_cdc_mysql_sink_to_mysql_spark.sources.json_envelopes import (
        parse_envelope_lines,
        split_quarantine,
    )

    raw = spark.createDataFrame([("x",)], "value string")
    good, _ = split_quarantine(parse_envelope_lines(raw))
    optimized = (
        cdc.derive_turn_events(good)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert optimized.count("from_json") == 1
    assert "Exchange" not in optimized


def test_corpus_curation_anti_join_broadcasts_losers(spark):
    """The dup-loser anti-join must broadcast the (small, distinct-id)
    loser side: AQE cannot replan it (the localCheckpoint barrier in
    the MinHash feed hides the runtime size) and the sort-merge form
    shuffles the full profile relation — measured 33-47 s vs 13 s at
    sf10 (round-4 finding)."""
    plan = _plan(spark, "corpus_curation")
    assert "BroadcastHashJoin LeftAnti" in plan
    assert "SortMergeJoin LeftAnti" not in plan


def test_cell_assignment_argmax_is_aggregation_not_window(spark):
    """The broadcast-codebook argmax in similarity.ivf_assign AND
    semsearch.assign_cells must plan as a max_by hash aggregation
    (map-side partial reduces n*k scored rows to n before the
    exchange), NOT a row_number window — the window form shuffles
    every scored copy WITH its embedding payload (round-5 finding:
    sf10 one-shot pruned search 135.5 -> 62.3 s from this fix alone)."""
    from flink_cdc_mysql_sink_to_mysql_spark.operators import (
        cdc,
        semsearch,
        similarity,
    )
    from flink_cdc_mysql_sink_to_mysql_spark.sources.transcripts import (
        changelog_envelopes,
    )

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    ivf_plan = (
        similarity.ivf_assign(emb)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "max_by" in ivf_plan and "Window" not in ivf_plan

    rows = semsearch.embedding_rows(
        cdc.apply_changelog(changelog_envelopes(spark, SF_CORRECT))
    )
    cells_plan = (
        semsearch.assign_cells(rows, semsearch.index_codebook(rows))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # index_codebook legitimately uses one GLOBAL row_number window
    # (64 codebook rows, ordered by the index key); the ASSIGNMENT
    # itself must not rank the scored copies — no Window node ordering
    # by the cosine score
    assert "max_by" in cells_plan
    assert not [
        ln
        for ln in cells_plan.splitlines()
        if "Window" in ln and "ccos" in ln
    ]
