"""Simulate the grading driver: entry() smoke + queries() vs
oracle_sql() DuckDB differential at the given scale factor.

Usage: python scripts/driver_sim.py [sf_dir] [query ...]
(default sf0.01; optional query names restrict the run)
"""

from __future__ import annotations

import math
import os
import sys
from collections import Counter
from datetime import date, datetime
from decimal import Decimal

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as e  # noqa: E402
from canadiannewsdatapipeline_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.10g}"
    if isinstance(v, Decimal):
        return f"{float(v):.10g}"
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("driver-sim")
    n = len(e.entry(spark).collect())
    print(f"entry: {n} rows")
    assert n > 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    only = set(sys.argv[2:])
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    bad = []
    for name, fn in sorted(qs.items()):
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
        except Exception as exc:
            print(f"{name}: CRASH ({type(exc).__name__}: {str(exc)[:140]})")
            bad.append(name)
            continue
        if name not in oracles:
            print(f"{name}: rows-only ({len(srows)} rows)")
            continue
        res = con.execute(oracles[name])
        dcols = [d[0].lower() for d in res.description]
        drows = res.fetchall()
        scols = [c.lower() for c in sdf.columns]
        si = sorted(range(len(scols)), key=lambda i: scols[i])
        di = sorted(range(len(dcols)), key=lambda i: dcols[i])
        ok = (
            sorted(scols) == sorted(dcols)
            and len(srows) == len(drows)
            and Counter(tuple(canon(r[i]) for i in si) for r in srows)
            == Counter(tuple(canon(r[i]) for i in di) for r in drows)
        )
        print(f"{name}: {'OK' if ok else 'MISMATCH'} ({len(srows)} rows)")
        if not ok:
            bad.append(name)
    print("FAILED:", bad if bad else "none")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
