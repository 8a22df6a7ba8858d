"""Round-12 experiments, batch 2: rescue map-stage parallelism on
single-row-group inputs (scan tasks < cores).

Usage: python scripts/exp_batch2.py q1|cos|q8|quality
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F

from canadiannewsdatapipeline_spark.session import get_spark
from canadiannewsdatapipeline_spark.sources.registry import load_table
from scripts.ab_bench import ab

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def q1(spark):
    from canadiannewsdatapipeline_spark.queries.core import (
        _dec,
        _dsum,
    )

    def build(repart: bool):
        li = load_table(spark, SF_DIR, "lineitem")
        li = li.filter(
            F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
        ).select(
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_returnflag", "l_linestatus",
        )
        if repart:
            li = li.repartition(64)
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

    ab("q1 repartition-before-agg", build(False), build(True), trials=5)


def cos(spark):
    from canadiannewsdatapipeline_spark.operators.similarity import (
        _as_double,
        _norm2,
        _with_cosine_prenormed,
    )

    def build(repart: bool):
        emb = load_table(spark, SF_DIR, "embeddings")
        a = emb.filter(F.col("vec_id") < 20).select(
            F.col("vec_id").alias("query_id"), _as_double("embedding").alias("ea")
        ).withColumn("sqrt_na", F.sqrt(_norm2("ea")))
        bsrc = emb
        if repart:
            bsrc = bsrc.repartition(64)
        b = bsrc.select(
            F.col("vec_id").alias("id_b"), _as_double("embedding").alias("eb")
        ).withColumn("sqrt_nb", F.sqrt(_norm2("eb")))
        pairs = a.crossJoin(b).filter(F.col("query_id") != F.col("id_b"))
        ranked = _with_cosine_prenormed(pairs, "ea", "eb")
        w = Window.partitionBy("query_id").orderBy(
            F.col("cos_sim").desc(), F.col("id_b").asc()
        )
        return (
            ranked.select(
                "query_id",
                F.col("id_b").alias("neighbor_id"),
                F.row_number().over(w).alias("rnk"),
                "cos_sim",
            )
            .filter(F.col("rnk") <= 5)
            .select("query_id", "neighbor_id", "rnk", "cos_sim")
        )

    ab("cosine probe-side repartition", build(False), build(True), trials=5)


def q8(spark):
    from canadiannewsdatapipeline_spark.operators.topk import top_k_words

    def build(repart: bool):
        docs = load_table(spark, SF_DIR, "documents")
        if repart:
            docs = docs.repartition(64)
        return top_k_words(docs, "text", k=50, stopwords=("a", "the"))

    ab("q8 repartition-before-explode", build(False), build(True), trials=5)


def quality(spark):
    from canadiannewsdatapipeline_spark.operators.textstats import quality_features

    def build(repart: bool):
        docs = load_table(spark, SF_DIR, "documents")
        if repart:
            docs = docs.repartition(64)
        return quality_features(docs, "text", "doc_id")

    ab("text_quality repartition", build(False), build(True), trials=5)


def main():
    which = sys.argv[1]
    spark = get_spark(f"exp2-{which}")
    {"q1": q1, "cos": cos, "q8": q8, "quality": quality}[which](spark)
    spark.stop()


if __name__ == "__main__":
    main()
