"""Decompose exact_substring win: persist-only vs spread+persist."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ab_bench import check_same_rows
from canadiannewsdatapipeline_spark.session import get_spark
from canadiannewsdatapipeline_spark.sources.registry import load_table
from canadiannewsdatapipeline_spark.operators.dedup import shingle_hash_set
from canadiannewsdatapipeline_spark.operators.spread import spread

SF = "/root/testdata/sf0.1"
spark = get_spark("exp-substr")
spark.range(1_000_000).selectExpr("sum(id)").collect()
docs = load_table(spark, SF, "documents")


def build(docs_in):
    sh = shingle_hash_set(docs_in, "text", "doc_id", n=10).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    a = sh.select(F.col("id").alias("id_a"), "h")
    b = sh.select(F.col("id").alias("id_b"), "h")
    return (
        a.join(b, "h").filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("n_shared_windows"))
    )


arms = {"persist_only": build(docs), "spread_persist": build(spread(docs))}
check_same_rows(arms["persist_only"], arms["spread_persist"])
print("PARITY OK")
for name, df in arms.items():
    spark.catalog.clearCache()
    df.write.format("noop").mode("overwrite").save()
ts = {n: [] for n in arms}
for i in range(4):
    for name, df in arms.items():
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        ts[name].append(time.perf_counter() - t0)
for name, t in ts.items():
    print(name, [round(x, 3) for x in t], "min", round(min(t), 3))
spark.stop()
