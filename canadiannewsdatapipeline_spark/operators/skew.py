"""Skew mitigation: salting for hot keys — the manual fallback when
AQE's skew-join split (enabled in session.py) isn't available (e.g.
aggregations, or stream-side state partitioning).

At 100 TB a handful of hot keys (empty-string authors, boilerplate
band signatures, null-ish user ids) can put 100x the median load on
one shuffle partition. Two standard remedies, both pure DataFrame:

- ``salted_agg``: two-phase aggregation — partial agg on
  (key, salt=hash(row)%N), final agg on key. The first shuffle spreads
  a hot key over N partitions; the second only moves N pre-aggregated
  rows per key. Works for any algebraic aggregate (sum/count/min/max).
- ``salted_join``: big-side rows get a deterministic salt in [0, N);
  the small side is exploded xN with every salt value, then the join
  key becomes (key, salt). The hot key's rows land on N partitions at
  the cost of an N-fold replication of the SMALL side only.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(df: DataFrame, n: int) -> Column:
    # Deterministic per-row salt: hash of all columns mod n. Cheap,
    # reproducible (no rand()), uniform enough to split a hot key.
    return F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation. ``aggs`` maps output column ->
    'fn(col)' with fn in {sum, count, min, max} (the algebraic set that
    re-aggregates losslessly: partial counts re-combine via sum)."""
    recombine = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    partial_exprs, final_exprs = [], []
    for out, spec in aggs.items():
        fn, col = spec.rstrip(")").split("(")
        if fn not in recombine:
            raise ValueError(f"non-algebraic aggregate: {fn}")
        partial_exprs.append(F.expr(f"{fn}({col})").alias(f"_p_{out}"))
        final_exprs.append(F.expr(f"{recombine[fn]}(_p_{out})").alias(out))
    return (
        df.withColumn("_salt", _salt_col(df, n_salts))
        .groupBy(*keys, "_salt")
        .agg(*partial_exprs)
        .groupBy(*keys)
        .agg(*final_exprs)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join on ``key``: salt the big side, explode the
    small side across all salts, join on (key, salt). Output columns =
    big ++ small-minus-key, same as a plain ``big.join(small, key)``."""
    b = big.withColumn("_salt", _salt_col(big, n_salts))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return b.join(s, [key, "_salt"], how).drop("_salt")
