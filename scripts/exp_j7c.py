from __future__ import annotations
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import Window, functions as F
from canadiannewsdatapipeline_spark.session import get_spark
from canadiannewsdatapipeline_spark.sources.registry import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

def t(df, label, n=4):
    df.write.format("noop").mode("overwrite").save()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    print(f"{label}: min={min(ts):.3f} all={[round(x,3) for x in ts]}")

def main():
    spark = get_spark("exp-j7c")
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_returnflag", "l_shipdate"
    )
    t(li, "scan only")
    w1 = Window.partitionBy("l_partkey", "l_returnflag")
    t(li.withColumn("m", F.min("l_shipdate").over(w1)), "1 window (partkey)")
    w3 = Window.partitionBy("l_orderkey", "l_returnflag")
    t(li.withColumn("m", F.min("l_shipdate").over(w3)), "1 window (orderkey)")
    two = li.withColumn("m1", F.min("l_shipdate").over(w1)).withColumn("m3", F.min("l_shipdate").over(w3))
    t(two, "2 windows")
    print("rows:", li.count())
    spark.stop()

if __name__ == "__main__":
    main()
