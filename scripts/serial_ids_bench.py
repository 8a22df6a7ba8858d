"""Measure the serial-id assignment fix (r10 verdict #1): the old
unpartitioned `row_number()` window (whole batch through ONE
partition) vs `assign_serial_ids`'s distributed two-phase form, on a
synthetic ingest-shaped batch far past golden-test scale. Records
walls, the plans' exchange shapes, and value equality on a sample.

Usage: python scripts/serial_ids_bench.py [n_rows] [--out OUT.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    argv = sys.argv[1:]
    n_rows = int(argv[0]) if argv and not argv[0].startswith("--") else 5_000_000
    out_path = (
        argv[argv.index("--out") + 1] if "--out" in argv else "SERIAL_IDS.json"
    )

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from canadiannewsdatapipeline_spark.operators.serial_ids import (
        assign_serial_ids,
    )
    from canadiannewsdatapipeline_spark.session import get_spark

    spark = get_spark("serial-ids-bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # ingest-shaped batch: 4 string sort keys like (source, url,
    # title, author), deterministic content, unique composite key
    batch = spark.range(n_rows).select(
        F.concat(F.lit("src"), (F.col("id") % 7).cast("string")).alias(
            "source_name"
        ),
        F.concat(
            F.lit("https://news.ca/a/"), F.col("id").cast("string")
        ).alias("url"),
        F.concat(F.lit("Title "), (F.col("id") % 40).cast("string")).alias(
            "title"
        ),
        F.when(F.col("id") % 97 == 0, F.lit(None))
        .otherwise(F.concat(F.lit("Author "), (F.col("id") % 11).cast("string")))
        .alias("author"),
    )
    cols = ["source_name", "url", "title", "author"]

    def run(tag, fn):
        t0 = time.perf_counter()
        df = fn()
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        plan = df._jdf.queryExecution().executedPlan().toString()
        return {
            "sec": round(wall, 3),
            "single_partition_exchange": "SinglePartition" in plan,
        }, df

    old_rec, old_df = run(
        "old",
        lambda: batch.withColumn(
            "id", F.row_number().over(Window.orderBy(*cols))
        ),
    )
    new_rec, new_df = run(
        "new", lambda: assign_serial_ids(batch, cols, "id")
    )
    # value equality on a deterministic slice (full collect of 5M
    # would be a driver-side anti-pattern in its own benchmark)
    probe = [1, 2, n_rows // 2, n_rows - 1, n_rows]
    old_rows = {
        r["id"]: (r["source_name"], r["url"])
        for r in old_df.filter(F.col("id").isin(probe)).collect()
    }
    new_rows = {
        r["id"]: (r["source_name"], r["url"])
        for r in new_df.filter(F.col("id").isin(probe)).collect()
    }
    result = {
        "metric": "serial_id_assignment_old_vs_new",
        "n_rows": n_rows,
        "old_unpartitioned_window": old_rec,
        "new_two_phase": new_rec,
        "probe_ids_equal": old_rows == new_rows,
        "speedup": round(old_rec["sec"] / new_rec["sec"], 2),
    }
    print(json.dumps(result))
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
