"""Execution-model constraint (BASELINE.md / input_hint): all Python in
the data path must be vectorized (pandas UDFs / mapInPandas /
applyInPandasWithState) — never row-at-a-time `udf()`. Enforced
statically over the whole package."""

from __future__ import annotations

import re
from pathlib import Path

PKG = Path(__file__).resolve().parents[1] / "flink_cdc_mysql_sink_to_mysql_spark"

FORBIDDEN = [
    r"\bF\.udf\(",
    r"^\s*@udf\b",
    r"\budf\s*\(",  # any bare call form, incl. udf(named_fn)
    r"import\s+udf\b",  # the import that enables the bare form
    r"spark\.udf\.register",
    r"\.rdd\b",  # no RDD hops in the engine either
]


def test_no_row_at_a_time_python():
    offenders = []
    for p in PKG.rglob("*.py"):
        src = p.read_text()
        for pat in FORBIDDEN:
            for m in re.finditer(pat, src, flags=re.MULTILINE):
                line = src[: m.start()].count("\n") + 1
                offenders.append(f"{p.relative_to(PKG.parent)}:{line}: {pat}")
    assert not offenders, "row-at-a-time Python in the engine:\n" + "\n".join(
        offenders
    )
