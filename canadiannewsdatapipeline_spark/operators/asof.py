"""As-of (most-recent-prior) join — the classic time-series operator
Spark has no built-in for.

The naive formulation (equi-join on the key, filter right.ts <=
left.ts, argmax per left row) shuffles BOTH tables and fans out to
|left| x |matching right| intermediate rows before the argmax prunes
them — quadratic per key in the worst case. This implementation uses
the union + windowed last-non-null formulation instead:

1. tag left rows side=1, right rows side=0, union by position;
2. one window per key ordered by (ts, side) — right rows sort before
   left rows at equal timestamps, giving inclusive ``>=`` semantics;
3. ``last(col, ignorenulls=True)`` carries the most recent right
   payload forward onto every left row;
4. filter back to side=1.

One hash partition by key, linear in |left| + |right|, no fan-out —
the same shape at any scale, and AQE skew handling applies to the
single exchange. Matches DuckDB ``ASOF LEFT JOIN`` semantics (used as
the oracle) provided the right side has one row per (key, ts) — ASOF
is underspecified under right-side ties, so callers dedupe first
(``dedup_right_ties``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_right_ties(
    right: DataFrame, keys: Sequence[str], ts_col: str, tiebreaker: str
) -> DataFrame:
    """One right row per (keys, ts): keep the row with the max
    tiebreaker — the deterministic choice both engines reproduce
    (the tiebreaker must be unique within the tie group)."""
    w = Window.partitionBy(*keys, ts_col).orderBy(F.col(tiebreaker).desc())
    return (
        right.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
) -> DataFrame:
    """Left as-of join: every left row gains the ``right_payload``
    columns of the most recent right row with right_ts <= left_ts on
    the same key (nulls when no prior right row exists).

    ``right`` must be unique per (keys, right_ts); see
    ``dedup_right_ties``. The right row's timestamp is exposed as
    ``asof_ts`` alongside the payload."""
    keys = list(keys)
    lcols = [c for c in left.columns if c not in keys and c != left_ts]
    l_tag = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("asof_ts"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(c)
            for c in right_payload
        ],
    )
    r_tag = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.col(right_ts).alias("asof_ts"),
        *[F.col(c) for c in right_payload],
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = [
        F.last(c, ignorenulls=True).over(w).alias(c)
        for c in ("asof_ts", *right_payload)
    ]
    return (
        l_tag.unionByName(r_tag)
        .select(*keys, "_ts", "_side", *lcols, *carried)
        .filter(F.col("_side") == 1)
        .drop("_side")
        .withColumnRenamed("_ts", left_ts)
    )
