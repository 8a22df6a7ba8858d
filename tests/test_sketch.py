"""KMV sketch: exact below k, bounded relative error above k, and the
mergeability invariant that makes it scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from canadiannewsdatapipeline_spark.operators.sketch import kmv_distinct


def test_kmv_exact_below_k(spark):
    df = spark.range(40).select(F.lit("g").alias("grp"), F.col("id").alias("v"))
    # duplicates must not inflate the sketch
    df = df.union(df)
    row = kmv_distinct(df, "grp", "v", k=64).collect()[0]
    assert row["n_kept"] == 40
    assert row["kmv_est"] == 40.0


def test_kmv_relative_error_above_k(spark):
    df = spark.range(10_000).select(
        (F.col("id") % 3).cast("string").alias("grp"), F.col("id").alias("v")
    )
    for row in kmv_distinct(df, "grp", "v", k=64).collect():
        exact = len([i for i in range(10_000) if i % 3 == int(row["grp"])])
        # k=64 -> stderr ~ 1/sqrt(62) ~ 13%; 3 sigma bound
        assert abs(row["kmv_est"] - exact) / exact < 0.4


def test_kmv_deterministic(spark):
    df = spark.range(5_000).select(F.lit("g").alias("grp"), F.col("id").alias("v"))
    a = kmv_distinct(df, "grp", "v", k=64).collect()[0]
    b = kmv_distinct(df.orderBy(F.rand(7)), "grp", "v", k=64).collect()[0]
    # order-insensitive and rerun-stable (no RNG anywhere)
    assert a["u_k"] == b["u_k"] and a["kmv_est"] == b["kmv_est"]
