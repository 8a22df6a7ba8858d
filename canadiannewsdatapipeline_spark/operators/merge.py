"""MERGE / upsert as a pure DataFrame rewrite.

The reference's UPDATE write-back (S18, sentiment_batch_job_tasks.py
conditional overwrite) generalizes to SQL MERGE: update matched rows,
insert unmatched source rows, keep unmatched target rows. Without a
transactional table format, the distributed rewrite is a single FULL
OUTER equi-join on the merge keys with column-wise COALESCE —
one shuffle each side, AQE picks broadcast when the delta is small
(the common case: daily delta << accumulated target).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """WHEN MATCHED UPDATE SET * / WHEN NOT MATCHED INSERT * via
    full-outer join + coalesce(source, target) per column.

    Source must share the target's schema. Rows matched on ``keys``
    take every source value; unmatched target rows pass through;
    unmatched source rows are inserts. Deterministic — no
    last-writer-wins races (dedupe the source on keys first if it can
    contain multiple rows per key)."""
    s = source.select([F.col(c).alias(f"__s_{c}") for c in source.columns])
    cond = [target[k] == s[f"__s_{k}"] for k in keys]
    joined = target.join(s, cond, "full_outer")
    return joined.select(
        [
            F.coalesce(F.col(f"__s_{c}"), target[c]).alias(c)
            for c in target.columns
        ]
    )
