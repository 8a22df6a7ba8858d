"""Simulate the grading driver: entry() smoke + queries() vs
oracle_sql() DuckDB differential at the given scale factor.

Usage: python scripts/driver_sim.py [sf_dir] [query ...] [--json OUT]
(default sf0.01; optional query names restrict the run)

--json OUT additionally writes a machine-readable artifact in the
driver's CORRECTNESS_r{N}.json per-query shape ({rows_match,
schema_match, hash_match, spark_rows, oracle_rows, err}; queries
without an oracle_sql entry get the driver's weaker rows-only shape).
The committed CORRECTNESS_LOCAL_r{N}.json artifacts are built from
this: the driver's own sample has drawn the same 50 names since round
2, so the other ~127 registered queries would otherwise have no
machine-readable correctness row at all (r6 verdict #4).
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
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            print(
                "usage: driver_sim.py [--json OUT.json] [SF_DIR] "
                "[QUERY ...]  (--json requires a path)",
                file=sys.stderr,
            )
            return 2
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    spark = get_spark("driver-sim")
    n = len(e.entry(spark).collect())
    print(f"entry: {n} rows")
    assert n > 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    only = set(argv[1:])
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    bad = []
    report = {}
    for name, fn in sorted(qs.items()):
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
        except Exception as exc:
            print(f"{name}: CRASH ({type(exc).__name__}: {str(exc)[:140]})")
            bad.append(name)
            report[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None, "oracle_rows": None,
                "err": f"{type(exc).__name__}: {str(exc)[:200]}",
            }
            continue
        if name not in oracles:
            print(f"{name}: rows-only ({len(srows)} rows)")
            report[name] = {
                "rows_only": True, "spark_rows": len(srows), "err": None,
            }
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0].lower() for d in res.description]
            drows = res.fetchall()
        except Exception as exc:
            print(f"{name}: ORACLE CRASH ({type(exc).__name__}: {str(exc)[:140]})")
            bad.append(name)
            report[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": len(srows),
                "oracle_rows": None,
                "err": f"oracle: {type(exc).__name__}: {str(exc)[:200]}",
            }
            continue
        scols = [c.lower() for c in sdf.columns]
        si = sorted(range(len(scols)), key=lambda i: scols[i])
        di = sorted(range(len(dcols)), key=lambda i: dcols[i])
        rows_match = len(srows) == len(drows)
        schema_match = sorted(scols) == sorted(dcols)
        hash_match = schema_match and rows_match and (
            Counter(tuple(canon(r[i]) for i in si) for r in srows)
            == Counter(tuple(canon(r[i]) for i in di) for r in drows)
        )
        ok = rows_match and schema_match and hash_match
        print(f"{name}: {'OK' if ok else 'MISMATCH'} ({len(srows)} rows)")
        report[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": len(srows),
            "oracle_rows": len(drows), "err": None,
        }
        if not ok:
            bad.append(name)
    print("FAILED:", bad if bad else "none")
    if json_out:
        import json

        with open(json_out, "w") as fh:
            json.dump({"sf_dir": sf_dir, "queries": report}, fh, indent=1)
        print(f"wrote {json_out} ({len(report)} queries)")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
