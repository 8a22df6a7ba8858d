"""A/B for the second pair of r12 share-one-pass changes (cold runs):

  E8 text_tfidf_topterms: persist tf across the df-agg and score join
  E9 events_cohort_retention: persist the user-cardinality cohorts agg
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from canadiannewsdatapipeline_spark.queries import QUERIES  # noqa: E402
from canadiannewsdatapipeline_spark.session import get_spark  # noqa: E402
from canadiannewsdatapipeline_spark.sources.registry import load_table  # noqa: E402
from scripts.ab_bench import check_same_rows  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def old_tfidf(spark):
    docs = load_table(spark, SF_DIR, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
        ).alias("tok"),
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = tf.join(df, "tok").join(F.broadcast(n_docs)).select(
        "doc_id",
        "tok",
        F.round(
            F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("tok").asc()
    )
    return (
        scored.filter(F.col("doc_id") % 20 == 0)
        .select("doc_id", F.row_number().over(w).alias("rnk"), "tok", "tfidf")
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "rnk", "tok", "tfidf")
    )


def old_cohort(spark):
    ev = load_table(spark, SF_DIR, "events")
    wk = F.date_trunc("week", F.col("ts"))
    cohorts = ev.groupBy("user_id").agg(F.min(wk).alias("cohort_week"))
    activity = ev.select("user_id", wk.alias("week")).distinct()
    sizes = cohorts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    ret = (
        cohorts.join(activity, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return ret.join(sizes, "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        "cohort_size",
        F.round(
            F.col("n_active").cast("double") / F.col("cohort_size"), 6
        ).alias("retention_rate"),
    )


def main() -> None:
    spark = get_spark("exp-batch4")
    pairs = {
        "text_tfidf_topterms": (
            old_tfidf(spark),
            QUERIES["text_tfidf_topterms"].fn.__wrapped__(spark, SF_DIR),
        ),
        "events_cohort_retention": (
            old_cohort(spark),
            QUERIES["events_cohort_retention"].fn.__wrapped__(spark, SF_DIR),
        ),
    }
    for name, (old, new) in pairs.items():
        check_same_rows(old, new)
        print(f"{name}: PARITY OK", flush=True)
        spark.catalog.clearCache()
        old.write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        new.write.format("noop").mode("overwrite").save()
        ts_old, ts_new = [], []
        for _ in range(5):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            old.write.format("noop").mode("overwrite").save()
            ts_old.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            new.write.format("noop").mode("overwrite").save()
            ts_new.append(time.perf_counter() - t0)
        print(
            f"{name}: old min {min(ts_old):.3f} mean "
            f"{sum(ts_old) / len(ts_old):.3f} | new min {min(ts_new):.3f} "
            f"mean {sum(ts_new) / len(ts_new):.3f} | "
            f"ratio(min) {min(ts_old) / min(ts_new):.2f}x",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
