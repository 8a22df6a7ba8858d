from __future__ import annotations
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import Window, functions as F
from canadiannewsdatapipeline_spark.operators.backfill import disjunctive_group_min
from canadiannewsdatapipeline_spark.session import get_spark
from canadiannewsdatapipeline_spark.sources.registry import load_table
from scripts.ab_bench import ab

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

def hybrid(li):
    # agg+broadcast-join for low-cardinality partitionings, window for
    # the near-row-cardinality orderkey branch
    out = li
    mins = []
    for i, keys in enumerate([("l_partkey", "l_returnflag"), ("l_suppkey", "l_returnflag")]):
        gm = li.groupBy(*[F.col(k).alias(f"_k{i}_{j}") for j, k in enumerate(keys)]).agg(
            F.min("l_shipdate").alias(f"_gm{i}")
        )
        cond = None
        for j, k in enumerate(keys):
            c = out[k].eqNullSafe(gm[f"_k{i}_{j}"])
            cond = c if cond is None else (cond & c)
        out = out.join(gm, cond, "left").drop(*[f"_k{i}_{j}" for j in range(len(keys))])
        mins.append(F.col(f"_gm{i}"))
    w = Window.partitionBy("l_orderkey", "l_returnflag")
    mins.append(F.min("l_shipdate").over(w))
    return out.withColumn("fixed_shipdate", F.least(*mins)).select(
        "l_orderkey", "l_linenumber", "fixed_shipdate"
    )

def main():
    spark = get_spark("exp-j7b")
    li = load_table(spark, SF_DIR, "lineitem")
    old = disjunctive_group_min(
        li, "l_shipdate",
        partitionings=[("l_partkey", "l_returnflag"), ("l_suppkey", "l_returnflag"), ("l_orderkey", "l_returnflag")],
        out_col="fixed_shipdate",
    ).select("l_orderkey", "l_linenumber", "fixed_shipdate")
    new = hybrid(li)
    ab("j7 window vs hybrid", old, new, trials=5)
    spark.stop()

if __name__ == "__main__":
    main()
