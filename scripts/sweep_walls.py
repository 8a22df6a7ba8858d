"""Wall-time sweep of EVERY registered query at a given warehouse.

The r12 scan/reuse audits ranked queries by duplicated-subtree counts;
this ranks them by measured wall so nothing expensive hides outside
the 23 headline rows. One untimed warmup (plan build + codegen) then
min-of-2 timed noop-sink runs per query, appended incrementally to a
JSONL file so a partial run still yields data.

Usage: python scripts/sweep_walls.py [sf_dir] [out.jsonl]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from canadiannewsdatapipeline_spark.queries import QUERIES  # noqa: E402
from canadiannewsdatapipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sweep_walls.jsonl"
    spark = get_spark("sweep-walls")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    with open(out, "w") as fh:
        for name in sorted(QUERIES):
            spark.sparkContext._jvm.System.gc()
            spark.sparkContext.setJobDescription(f"sweep: {name}")
            t0 = time.perf_counter()
            try:
                df = QUERIES[name].fn(spark, sf_dir)
                plan_s = time.perf_counter() - t0
                df.write.format("noop").mode("overwrite").save()  # warmup
                trials = []
                for _ in range(2):
                    t1 = time.perf_counter()
                    QUERIES[name].fn(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    trials.append(time.perf_counter() - t1)
                rec = {
                    "name": name,
                    "min": round(min(trials), 3),
                    "plan": round(plan_s, 3),
                }
            except Exception as exc:  # record, keep sweeping
                rec = {"name": name, "err": f"{type(exc).__name__}: {exc}"[:200]}
            fh.write(json.dumps(rec) + "\n")
            fh.flush()
            print(rec, flush=True)
    spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
