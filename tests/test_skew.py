"""Salting must preserve exact semantics (same results as the naive
plan) while spreading hot keys across partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from canadiannewsdatapipeline_spark.operators.skew import salted_agg, salted_join


def _skewed(spark, n_hot=5000, n_tail=200):
    hot = spark.range(n_hot).select(
        F.lit("hot").alias("k"), (F.col("id") % 97).alias("v")
    )
    tail = spark.range(n_tail).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"), F.col("id").alias("v")
    )
    return hot.union(tail)


def test_salted_agg_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        (r["k"]): (r["s"], r["c"], r["mn"], r["mx"])
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("s"),
            F.count(F.lit(1)).alias("c"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r["k"]): (r["s"], r["c"], r["mn"], r["mx"])
        for r in salted_agg(
            df,
            ["k"],
            {"s": "sum(v)", "c": "count(v)", "mn": "min(v)", "mx": "max(v)"},
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_agg_spreads_hot_key(spark):
    df = _skewed(spark)
    partial = df.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(8))
    ).groupBy("k", "_salt")
    # the hot key must occupy >1 salt bucket (i.e. >1 shuffle partition)
    n_buckets = partial.count().filter("k = 'hot'").count()
    assert n_buckets > 1


def test_salted_join_matches_plain(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("hot", 1.5), ("k7", 2.0), ("absent", 9.9)], "k string, w double"
    )
    plain = big.join(small, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw")
    )
    salted = salted_join(big, small, "k", n_salts=8).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw")
    )
    assert {tuple(r) for r in salted.collect()} == {tuple(r) for r in plain.collect()}
    # left join keeps unmatched big rows exactly once
    lp = big.join(small, "k", "left").count()
    ls = salted_join(big, small, "k", n_salts=8, how="left").count()
    assert ls == lp
