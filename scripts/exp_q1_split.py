"""q1: single-row-group rescue via disjoint predicate-range union.

Each branch re-decodes the row group (cheap, vectorized) but the
decimal aggregation — the measured 0.7 s single-core cost — splits
across branches that run concurrently.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from canadiannewsdatapipeline_spark.queries.core import _dec, _dsum
from canadiannewsdatapipeline_spark.session import get_spark
from canadiannewsdatapipeline_spark.sources.registry import load_table
from scripts.ab_bench import ab

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def agg(li):
    one = F.lit("1.00").cast("decimal(3,2)")
    disc_price = _dec("l_extendedprice") * (one - _dec("l_discount", 4, 2))
    charge = disc_price * (one + _dec("l_tax", 4, 2))
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _dsum("l_quantity").alias("sum_qty"),
        _dsum("l_extendedprice").alias("sum_base_price"),
        F.sum(disc_price).cast("double").alias("sum_disc_price"),
        F.sum(charge).cast("double").alias("sum_charge"),
        (_dsum("l_quantity") / n).alias("avg_qty"),
        (_dsum("l_extendedprice") / n).alias("avg_price"),
        (_dsum("l_discount", 4, 2) / n).alias("avg_disc"),
        n.alias("count_order"),
    )


def main():
    spark = get_spark("exp-q1-split")
    li = load_table(spark, SF_DIR, "lineitem")
    base = li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
    old = agg(base)

    bounds = ["1993-06-01", "1994-12-01", "1996-06-01"]
    lo = [None] + bounds
    hi = bounds + [None]
    parts = []
    for a, b in zip(lo, hi):
        c = F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
        if a is not None:
            c = c & (F.col("l_shipdate") >= F.lit(a).cast("timestamp"))
        if b is not None:
            c = c & (F.col("l_shipdate") < F.lit(b).cast("timestamp"))
        parts.append(li.filter(c))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    new = agg(u)
    ab("q1 4-way range-split union", old, new, trials=6)
    spark.stop()


if __name__ == "__main__":
    main()
