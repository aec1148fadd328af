"""Property-based cross-check of the cohort rule compiler (SURVEY §5.2
item 5): random rules → the Column compiler and the independent SQL
renderer must agree row-exactly on the same events."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flink_cdc_mysql_sink_to_mysql_spark.operators import cohort
from tests.conftest import SF_SMOKE, register_views

NOW = "2024-01-30 00:00:00"

sub_params = st.lists(
    st.builds(
        cohort.SubParam,
        dimension=st.sampled_from([1, 2, 3]),
        operator=st.sampled_from([0, 1, 2, 3]),
        value=st.integers(min_value=0, max_value=500),
    ),
    max_size=4,
).map(tuple)

rules = st.builds(
    cohort.CohortRule,
    target=st.sampled_from(sorted(cohort.TARGET_TO_KIND) + [4, 5, 7]),
    is_exist=st.booleans(),
    value_days=st.integers(min_value=1, max_value=60),
    sub_params=sub_params,
)


@pytest.fixture(scope="module")
def ctx(spark):
    from flink_cdc_mysql_sink_to_mysql_spark.entry_queries import (
        _EVENTS_REL,
        _MEMBERS_REL,
        _turn_events_df,
    )
    from flink_cdc_mysql_sink_to_mysql_spark.sources import transcripts

    con = duckdb.connect()
    register_views(con, SF_SMOKE)
    events = _turn_events_df(spark, SF_SMOKE).cache()
    members = (
        transcripts(spark, SF_SMOKE).select("conv_id").distinct().cache()
    )
    events.count(), members.count()  # materialize once
    return spark, con, events, members


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rule=rules)
def test_rule_compiler_matches_sql(ctx, rule):
    from flink_cdc_mysql_sink_to_mysql_spark.entry_queries import (
        _EVENTS_REL,
        _MEMBERS_REL,
    )

    spark, con, events, members = ctx
    got = sorted(
        r.conv_id
        for r in cohort.evaluate_rule(members, events, rule, NOW).collect()
    )
    sql = cohort.rule_to_sql(rule, _EVENTS_REL, _MEMBERS_REL, NOW)
    want = sorted(r[0] for r in con.execute(sql).fetchall())
    assert got == want
