"""Correlated-subquery backfills rewritten as window aggregates
(SURVEY.md §2.3 J4-J7, §4.2 items 1-2).

The reference backfills missing article content / author URL / author
email with correlated ``SELECT DISTINCT ... LIMIT 1`` scalar subqueries
(transformed.sql:41-54, 112-154) and fixes publish dates with a
correlated MIN over an OR of three equi-predicates
(transformed.sql:191-205). Correlated LIMIT 1 is nondeterministic and
O(n^2); the window rewrite is deterministic and one shuffle per
partitioning — it survives a 100x scale-up where the self-join form
would not.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def backfill_within_group(
    df: DataFrame,
    col: str,
    keys: Sequence[str],
    strategy: str = "max",
    out_col: str | None = None,
) -> DataFrame:
    """Fill NULLs in ``col`` from non-null values of the same group.

    ``strategy`` picks the deterministic representative: ``max`` /
    ``min`` (order-free, engine-portable — our default replacement for
    the reference's arbitrary ``LIMIT 1``).
    """
    w = Window.partitionBy(*keys)
    agg = {"max": F.max, "min": F.min}[strategy](F.col(col)).over(w)
    return df.withColumn(out_col or col, F.coalesce(F.col(col), agg))


def disjunctive_group_min(
    df: DataFrame,
    col: str,
    partitionings: Sequence[Sequence[str]],
    out_col: str,
) -> DataFrame:
    """MIN(col) over rows matching ANY of several key tuples —
    transformed.sql:191-205 (earliest publishedat among rows matching
    (title|url|content, author, source)).

    Each OR branch becomes a window MIN over its own partitioning;
    ``least()`` of the branch minima equals the min over the union of
    matching rows, because every matching row appears in at least one
    branch's partition (SURVEY.md §4.2 item 2). Three shuffles instead
    of a quadratic disjunctive self-join.
    """
    mins = [F.min(F.col(col)).over(Window.partitionBy(*keys)) for keys in partitionings]
    expr = mins[0] if len(mins) == 1 else F.least(*mins)
    return df.withColumn(out_col, expr)
