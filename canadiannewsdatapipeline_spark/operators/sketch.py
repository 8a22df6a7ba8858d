"""Distinct-count sketching with K-Minimum-Values (KMV).

`approx_count_distinct` (HLL++) is the built-in at 100 TB, but its
register layout is engine-private — useless for a differential
correctness gate. KMV (Bar-Yossef et al. 2002, "Counting distinct
elements in a data stream") is the sketch you can make *bit-portable*:
hash every value to a uniform double in [0,1), keep the k smallest
distinct hashes per group, estimate distinct = (k-1) / u_k where u_k
is the k-th minimum. All md5-derived integer arithmetic + one double
division — both engines agree exactly, so the approximate answer
itself is hash-checked by the oracle.

Scale shape: the distinct + window top-k is one shuffle on the group
key; the per-group state is k doubles (k=64 -> 512 bytes), the same
mergeable-sketch property HLL offers (union = min-merge of KMV sets),
so partial sketches combine map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 2^60: the hash domain — 15 hex chars of md5, exact in a bigint and
# exactly representable as a double (no rounding on the division).
_DOMAIN = float(1 << 60)


def kmv_distinct(
    df: DataFrame, group_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """(group, n_kept, u_k, kmv_est): KMV distinct estimate per group
    (n_kept = min(k, true distinct) sketch occupancy). Groups with
    fewer than k distinct values report the exact count (standard KMV
    small-range correction: if |kept| < k the estimate IS the kept
    count)."""
    u = (
        F.conv(F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        .cast("double")
        / F.lit(_DOMAIN)
    )
    per = df.select(F.col(group_col).alias("g"), u.alias("u")).distinct()
    w = Window.partitionBy("g").orderBy(F.col("u").asc())
    ranked = per.select("g", "u", F.row_number().over(w).alias("r")).filter(
        F.col("r") <= k
    )
    return (
        ranked.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.max(F.when(F.col("r") == k, F.col("u"))).alias("u_k"),
        )
        .select(
            F.col("g").alias(group_col),
            "n_kept",
            F.round(F.coalesce("u_k", F.lit(0.0)), 10).alias("u_k"),
            F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
            .otherwise(F.round(F.lit(float(k - 1)) / F.col("u_k"), 4))
            .alias("kmv_est"),
        )
    )


def kmv_merged_global(
    df: DataFrame, group_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """Global KMV estimate computed by MERGING per-group sketches —
    the mergeability property that makes KMV (like HLL) usable as a
    distributed partial aggregate.

    Each group keeps its k smallest distinct hashes; the merge is the
    k smallest of the union of kept sets. Because every one of the
    global k minima is necessarily within its own group's k minima,
    the merged sketch is IDENTICAL to the sketch built directly over
    the full stream — the differential oracle checks that invariant
    exactly (not approximately). At scale this is two bounded
    shuffles: per-group top-k, then a union whose size is
    (#groups x k) rows, never the raw data."""
    u = (
        F.conv(F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        .cast("double")
        / F.lit(_DOMAIN)
    )
    per = df.select(F.col(group_col).alias("g"), u.alias("u")).distinct()
    wg = Window.partitionBy("g").orderBy(F.col("u").asc())
    kept = per.select("g", "u", F.row_number().over(wg).alias("r")).filter(
        F.col("r") <= k
    )
    # merge: k smallest of the union of per-group keeps (dedup u across
    # groups — the same value in two groups is one distinct element)
    # global k-minimum via sort+limit over the (#groups x k)-row union —
    # TakeOrderedAndProject, not a single-partition window
    merged = kept.select("u").distinct().orderBy(F.col("u").asc()).limit(k)
    return merged.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("u").alias("mx"),
    ).select(
        "n_kept",
        F.round(
            F.when(F.col("n_kept") == k, F.col("mx")).otherwise(F.lit(0.0)), 10
        ).alias("u_k"),
        F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
        .otherwise(F.round(F.lit(float(k - 1)) / F.col("mx"), 4))
        .alias("kmv_est"),
    )
