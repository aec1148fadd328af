"""Every registered query must be run-to-run deterministic — the driver
value-hashes results, so any nondeterminism (unstable ties, partition-
dependent values, wall-clock reads) is a correctness failure even when
each run is 'right'. Runs the full registry twice at sf0.001."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry
from tests.conftest import SF_SMOKE
from tests.util import canon

QUERY_NAMES = sorted(entry.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_is_deterministic(spark, name):
    q = entry.queries()[name]
    a = canon(q(spark, SF_SMOKE).toPandas())
    b = canon(q(spark, SF_SMOKE).toPandas())
    assert a == b, f"{name}: two runs disagree"
