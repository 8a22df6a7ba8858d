"""Duplicate-scan audit: for every registered query, count how many
times each parquet table appears as a scan in the fresh physical plan.

A table scanned >= 2x in one plan is a candidate for the r12
"share one pass" treatment (text_bigram_logprob 3->2, daily_resample
2->1) — though 2x is often the legitimate decide-on-small-rows /
re-attach-payload shape (guide §8), so hits are leads, not defects.

Usage: python scripts/scan_audit.py [min_count]  (default 2)
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from canadiannewsdatapipeline_spark.queries import QUERIES  # noqa: E402
from canadiannewsdatapipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    min_count = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = get_spark("scan-audit")
    hits = 0
    for name in sorted(QUERIES):
        fn = QUERIES[name].fn
        fn = getattr(fn, "__wrapped__", fn)
        try:
            df = fn(spark, SF_DIR)
        except Exception as exc:  # streaming rows etc.
            print(f"{name}: SKIP ({type(exc).__name__})")
            continue
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        # one "Location: ... <table>.parquet" line per scan node in the
        # numbered detail section
        tables = Counter(
            m.group(1)
            for m in re.finditer(r"Location:.*?([a-z_0-9]+)\.parquet", plan)
        )
        flagged = {t: c for t, c in tables.items() if c >= min_count}
        if flagged:
            hits += 1
            print(f"{name}: {flagged}")
    print(f"-- {hits} queries with a table scanned >= {min_count}x --")
    spark.stop()


if __name__ == "__main__":
    main()
