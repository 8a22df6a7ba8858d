"""Sweep every registered query's physical plan for 100 TB red flags.

Flags, per query:
- CartesianProduct (unbounded cross join — always wrong at scale)
- BroadcastNestedLoopJoin (acceptable ONLY when one side is a bounded
  dimension/scalar; listed so each instance can be justified)
- BatchEvalPython / row-at-a-time Python UDFs in the plan (the slow
  path; Arrow stages show as ArrowEvalPython/MapInPandas and are fine
  at plugin seams)
- parquet scans with no pushed filters while the query filters
  (potential missed pushdown; heuristic)
- exchange-count outliers (shuffle-heavy plans worth a manual look)

Usage: python scripts/plan_audit.py [sf_dir]
Exit 0 always — this is a report, not a gate; the hard guarantees live
in tests/test_physical_plans.py.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from canadiannewsdatapipeline_spark.queries import QUERIES  # noqa: E402
from canadiannewsdatapipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan-audit")
    rows = []
    for name, spec in sorted(QUERIES.items()):
        try:
            df = spec.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "simple"
                )
            )
        except Exception as e:  # pragma: no cover
            rows.append((name, {"ERROR": str(e)[:120]}))
            continue
        flags = {}
        if "CartesianProduct" in plan:
            flags["cartesian"] = plan.count("CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan:
            flags["bnlj"] = plan.count("BroadcastNestedLoopJoin")
        if "BatchEvalPython" in plan:
            flags["py_udf"] = plan.count("BatchEvalPython")
        nex = plan.count("Exchange hashpartitioning")
        if nex >= 5:
            flags["exchanges"] = nex
        # scans reading every column of a wide table
        for m in re.finditer(r"ReadSchema: struct<([^>\n]*)", plan):
            ncols = m.group(1).count(":")
            if ncols >= 12:
                flags["wide_scan_cols"] = max(flags.get("wide_scan_cols", 0), ncols)
        if flags:
            rows.append((name, flags))
    print(f"-- {len(QUERIES)} queries audited, {len(rows)} flagged --")
    for name, flags in rows:
        print(f"{name}: {flags}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
