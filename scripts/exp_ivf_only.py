"""Isolated re-run of the sim_ann_ivf A/B (cold runs, interleaved)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from canadiannewsdatapipeline_spark.queries import QUERIES  # noqa: E402
from canadiannewsdatapipeline_spark.session import get_spark  # noqa: E402
from canadiannewsdatapipeline_spark.sources.registry import load_table  # noqa: E402
from scripts.exp_batch3 import COS_T, old_ann_ivf  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark("exp-ivf")
    emb = load_table(spark, SF_DIR, "embeddings")
    old = old_ann_ivf(emb, "vec_id", "embedding", COS_T, F.col("vec_id") < 32, 6)
    new = QUERIES["sim_ann_ivf"].fn.__wrapped__(spark, SF_DIR)
    spark.catalog.clearCache()
    old.write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    new.write.format("noop").mode("overwrite").save()
    ts_old, ts_new = [], []
    for _ in range(7):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        old.write.format("noop").mode("overwrite").save()
        ts_old.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        new.write.format("noop").mode("overwrite").save()
        ts_new.append(time.perf_counter() - t0)
    print(
        f"old: {[round(t, 2) for t in ts_old]} min {min(ts_old):.3f}\n"
        f"new: {[round(t, 2) for t in ts_new]} min {min(ts_new):.3f}\n"
        f"ratio(min) {min(ts_old) / min(ts_new):.2f}x",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
