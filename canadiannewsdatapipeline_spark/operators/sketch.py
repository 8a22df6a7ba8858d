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
