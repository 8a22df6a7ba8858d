"""Window-based dedup operators (SURVEY.md §2.3 J2, §2.4 A3, §2.7 U2).

The reference's dedup shapes are Postgres idioms — a right join against
``MAX(creation_time)`` per key (articles.sql:36-58) and ``DISTINCT ON``
without ORDER BY (articles.sql:7-19, nondeterministic). We rewrite both
as single-shuffle ``row_number`` windows with explicit deterministic
tiebreakers (SURVEY.md §4.2 item 3, §7.4 item 1).

Scale note: one hash shuffle on the partition keys; no self-join, no
second scan of the input. Skewed keys are handled by AQE skew-join /
partition splitting since there is no join at all.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RN = "__rn"


def _one_per_key(df: DataFrame, keys: Sequence[str], order: Sequence[Column]) -> DataFrame:
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn(_RN, F.row_number().over(w)).filter(F.col(_RN) == 1).drop(_RN)


def latest_row_per_key(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Keep the newest row per key (articles.sql:36-58 rewrite).

    The reference's right-join form duplicates rows on creation-time
    ties; we impose ``ts DESC, tiebreakers DESC`` for determinism.
    """
    order = [F.col(ts_col).desc()] + [F.col(t).desc() for t in tiebreakers]
    return _one_per_key(df, keys, order)


def distinct_on(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[Column]
) -> DataFrame:
    """Postgres ``SELECT DISTINCT ON (keys)`` with an explicit, hence
    deterministic, ordering (articles.sql:7-19 rewrite)."""
    return _one_per_key(df, keys, list(order_by))


def keep_first_by_order(
    df: DataFrame, keys: Sequence[str], pos_col: str
) -> DataFrame:
    """Order-preserving dedup — ``list(dict.fromkeys(urls))`` at
    utils.py:72: first occurrence (min position) per key wins."""
    return _one_per_key(df, keys, [F.col(pos_col).asc()])


def top_n_per_group(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column], n: int
) -> DataFrame:
    """Per-group head — the reference's per-source ``links[:n_articles]``
    slice (get_news.py:338-340), distributed: no driver-side slicing."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= n)
