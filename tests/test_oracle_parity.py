"""Runs every queries() entry against its oracle_sql() via DuckDB at
sf0.01 — a local replica of the driver's correctness gate."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry
from tests.conftest import SF_CORRECT, register_views

QUERY_NAMES = sorted(entry.queries().keys())


@pytest.fixture(scope="module")
def duck_correct():
    con = duckdb.connect()
    register_views(con, SF_CORRECT)
    return con


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck_correct, name):
    from tests.util import assert_same

    q = entry.queries()[name]
    sdf = q(spark, SF_CORRECT)
    oracle = entry.oracle_sql().get(name)
    if oracle is None:
        assert sdf.count() >= 0  # rows-only check (non-SQL-expressible op)
        return
    ddf = duck_correct.execute(oracle).df()
    assert_same(sdf, ddf, name)


def test_entry_smoke(spark):
    df = entry.entry(spark)
    assert df.count() > 0
