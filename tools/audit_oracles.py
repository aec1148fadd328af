#!/usr/bin/env python
"""Driver-grade oracle audit: run EVERY registered query against its
DuckDB oracle at sf0.01 and require column-, dtype-, and value-exact
results — stricter than tests/util.canon (the driver's value-hash is
sensitive to physical numeric width). Also sweeps a hostile DuckDB
session timezone to catch TIMESTAMPTZ coercion leaks.

    spark-submit --master local[8] tools/audit_oracles.py [sf_dir]

Exits non-zero listing any divergent query.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.appName("oracle-audit")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    con = duckdb.connect()
    con.execute("SET TimeZone='Asia/Shanghai'")  # hostile on purpose
    for t in TABLES:
        p = os.path.join(sf, t + ".parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    qs, osql = e.queries(), e.oracle_sql()
    bad = []
    for name in sorted(qs):
        try:
            sdf = qs[name](spark, sf).toPandas()
            odf = con.execute(osql[name]).df()
            scols, ocols = sorted(sdf.columns), sorted(odf.columns)
            if scols != ocols:
                bad.append((name, f"COLS {scols} vs {ocols}"))
                continue
            dts = dict(sdf.dtypes.astype(str))
            dto = dict(odf.dtypes.astype(str))
            dd = {c: (dts[c], dto[c]) for c in scols if dts[c] != dto[c]}
            s = sdf[scols].sort_values(scols).reset_index(drop=True)
            o = odf[ocols].sort_values(ocols).reset_index(drop=True)
            vals = s.shape == o.shape and all(
                (s[c].astype(str).values == o[c].astype(str).values).all()
                for c in scols
            )
            if dd:
                bad.append((name, f"DTYPE {dd}"))
            elif not vals:
                bad.append((name, "VALUES"))
            print(name, len(s), "OK" if not dd and vals else "BAD")
        except Exception as ex:  # noqa: BLE001 — audit must list, not die
            bad.append((name, f"ERR {str(ex)[:160]}"))
            print(name, "ERR")
    print("BAD:", bad if bad else "none")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
