"""Time-series resample with gap-filling (SURVEY.md §2.4 A7).

The reference does ``set_index(publishedat).resample('D').mean()`` in
pandas (sentiment_dashboard.py:296-300) — single-machine only. Here:
a day-grain groupBy joined against a generated date spine
(``sequence`` + ``explode``), so missing days surface as NULL rows
exactly like pandas resample. Distributed: the spine is a few thousand
rows (broadcast), the aggregate is one shuffle with map-side partials.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def daily_resample(
    df: DataFrame,
    ts_col: str,
    aggs: Sequence[tuple[Column, str]],
) -> DataFrame:
    """Daily aggregate over ``ts_col`` with a continuous date spine.

    ``aggs`` is a list of (aggregate_column, alias) pairs evaluated per
    day; days in [min, max] with no rows appear with NULL aggregates.

    The spine bounds derive from the daily aggregate, not from a second
    scan of ``df`` (r12 optimization): min/max over the distinct day
    keys equals min/max over all rows (to_date is order-preserving and
    both forms skip NULLs), so the input is read ONCE. ``daily`` is
    persisted because it feeds both the bounds and the join — without
    the pin, Catalyst plans two subtrees and the full input is scanned
    twice anyway (plan-verified on q7: 2 'Scan parquet events' -> 1).
    The cache is day-bounded (one row per distinct day — decades fit in
    kilobytes), so it is negligible at any input scale.
    """
    day = F.to_date(F.col(ts_col))
    daily = (
        df.groupBy(day.alias("day"))
        .agg(*[a.alias(name) for a, name in aggs])
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    spine = daily.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    ).select(F.explode(F.sequence("lo", "hi")).alias("day"))
    return spine.join(F.broadcast(daily), "day", "left")
