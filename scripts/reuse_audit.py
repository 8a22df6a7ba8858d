"""Runtime exchange-reuse audit for the multi-scan queries flagged by
scan_audit.py: execute each query (noop sink) and report, from the
FINAL adaptive plan, how many parquet scans actually remain vs how
many ReusedExchange / InMemoryTableScan nodes absorbed the static
plan's duplicate subtrees.

Usage: python scripts/reuse_audit.py <query> [...]
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
    names = sys.argv[1:]
    spark = get_spark("reuse-audit")
    for name in names:
        fn = QUERIES[name].fn
        fn = getattr(fn, "__wrapped__", fn)
        df = fn(spark, SF_DIR)
        spark.sparkContext.setJobDescription(f"reuse-audit: {name}")
        df.write.format("noop").mode("overwrite").save()
        final = df._jdf.queryExecution().executedPlan().toString()
        scans = Counter(
            m.group(1)
            for m in re.finditer(r"([a-z_0-9]+)\.parquet", final)
        )
        print(
            f"{name}: final-plan file refs {dict(scans)}, "
            f"ReusedExchange={final.count('ReusedExchange')}, "
            f"InMemoryTableScan={final.count('InMemoryTableScan')}, "
            f"ReusedSubquery={final.count('ReusedSubquery')}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
