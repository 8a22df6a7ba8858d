"""Round-12 optimization experiments, batch 1 (one session each run).

Usage: python scripts/exp_batch1.py e1|e2|e3|e4
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F
from pyspark.storagelevel import StorageLevel

from canadiannewsdatapipeline_spark.session import get_spark
from canadiannewsdatapipeline_spark.sources.registry import load_table
from scripts.ab_bench import ab

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def e1_bigram(spark):
    """Tokenize once (persist toks) instead of 3x."""
    from canadiannewsdatapipeline_spark.queries.corpus import text_bigram_logprob

    old = text_bigram_logprob.__wrapped__(spark, SF_DIR) if hasattr(
        text_bigram_logprob, "__wrapped__"
    ) else text_bigram_logprob(spark, SF_DIR)

    docs = load_table(spark, SF_DIR, "documents")
    toks = docs.select(
        "doc_id",
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0).alias("t"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    flat = toks.select("doc_id", F.explode("t").alias("g"))
    uni = flat.groupBy(F.col("g").alias("w1")).agg(F.count(F.lit(1)).alias("c1"))
    vocab = uni.agg(F.count(F.lit(1)).cast("double").alias("v"))
    bi = (
        toks.select("doc_id", "t", F.posexplode("t").alias("i", "w1"))
        .filter(F.col("i") < F.size("t") - 1)
        .select("doc_id", "w1", F.element_at("t", F.col("i") + 2).alias("w2"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    bc = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    logp = F.round(
        F.log((F.col("c2") + 1.0) / (F.col("c1") + F.col("v"))), 9
    ).cast("decimal(18,9)")
    model = (
        bc.join(uni, "w1").join(F.broadcast(vocab)).select("w1", "w2", logp.alias("logp"))
    )
    scored = bi.join(model, ["w1", "w2"]).select("doc_id", "logp")
    new = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (F.sum("logp").cast("double") / F.count(F.lit(1))).alias("avg_logprob"),
    )
    ab("bigram tokenize-once", old, new, trials=5)


def e2_q2_dedup(spark):
    """latest_row_per_key window vs max(struct) aggregation, in the q2 context."""
    from canadiannewsdatapipeline_spark.queries.core import q2_enriched_join_dedup

    old = q2_enriched_join_dedup(spark, SF_DIR)

    li = load_table(spark, SF_DIR, "lineitem")
    orders = load_table(spark, SF_DIR, "orders")
    cust = load_table(spark, SF_DIR, "customer")
    nation = load_table(spark, SF_DIR, "nation")
    filtered_orders = orders.filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("1996-12-31").cast("timestamp"),
        )
    )
    pruned = li.select("l_orderkey", "l_linenumber", "l_extendedprice").join(
        filtered_orders.select("o_orderkey"),
        F.col("l_orderkey") == F.col("o_orderkey"),
        "left_semi",
    )
    # max(struct(ts, tiebreakers)) == the row_number()=1 row's values
    latest = (
        pruned.groupBy("l_orderkey")
        .agg(F.max(F.struct("l_linenumber", "l_extendedprice")).alias("_top"))
        .select(
            "l_orderkey",
            F.col("_top.l_linenumber").alias("l_linenumber"),
            F.col("_top.l_extendedprice").alias("l_extendedprice"),
        )
    )
    new = (
        filtered_orders.join(latest, orders.o_orderkey == latest.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey, "left")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey, "left")
        .select(
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "o_orderpriority",
            "c_name",
            F.col("n_name").alias("nation_name"),
            F.col("l_linenumber").alias("last_linenumber"),
            F.col("l_extendedprice").alias("last_price"),
        )
    )
    ab("q2 window vs struct-max", old, new, trials=5)


def e3_stream(spark):
    """stream state_partitions: 2 (current) vs 1."""
    from canadiannewsdatapipeline_spark.sources.registry import load_table_raw
    from canadiannewsdatapipeline_spark.streaming.ingest import windowed_event_counts

    events_raw = load_table_raw(spark, SF_DIR, "events")

    def run(n):
        t0 = time.perf_counter()
        df = windowed_event_counts(spark, events_raw, state_partitions=n)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # warmups
    run(2), run(1)
    for trial in range(4):
        a = run(2)
        b = run(1)
        print(f"trial {trial}: sp=2 {a:.3f}s  sp=1 {b:.3f}s")


def e4_dot_unroll(spark):
    """sim_topk_cosine: HOF fold dot vs unrolled 64-term chain."""
    from canadiannewsdatapipeline_spark.operators.similarity import (
        _as_double,
        _norm2,
        cosine_topk,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    old = cosine_topk(emb, "vec_id", "embedding", F.col("vec_id") < 20, k=5)

    dim = 64
    # ((0.0 + a1*b1) + a2*b2) + ... — same left-to-right double-add
    # order as the sequential aggregate() fold
    dot_expr = "0.0D" + "".join(
        f" + (try_element_at(ea, {i}) * try_element_at(eb, {i}))"
        for i in range(1, dim + 1)
    )
    a = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), _as_double("embedding").alias("ea")
    ).withColumn("sqrt_na", F.sqrt(_norm2("ea")))
    b = emb.select(
        F.col("vec_id").alias("id_b"), _as_double("embedding").alias("eb")
    ).withColumn("sqrt_nb", F.sqrt(_norm2("eb")))
    pairs = a.crossJoin(b).filter(F.col("query_id") != F.col("id_b"))
    cos = F.try_divide(F.expr(dot_expr), F.col("sqrt_na") * F.col("sqrt_nb"))
    ranked = pairs.withColumn("cos_sim", F.round(cos, 4))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("id_b").asc()
    )
    new = (
        ranked.select(
            "query_id",
            F.col("id_b").alias("neighbor_id"),
            F.row_number().over(w).alias("rnk"),
            "cos_sim",
        )
        .filter(F.col("rnk") <= 5)
        .select("query_id", "neighbor_id", "rnk", "cos_sim")
    )
    ab("cosine dot fold vs unrolled", old, new, trials=5)


def main():
    which = sys.argv[1]
    spark = get_spark(f"exp-{which}")
    {"e1": e1_bigram, "e2": e2_q2_dedup, "e3": e3_stream, "e4": e4_dot_unroll}[which](
        spark
    )
    spark.stop()


if __name__ == "__main__":
    main()
