"""Bucketed tables: the shuffle-elimination primitive for repeated
big-big joins.

At 100 TB the fact-fact joins (lineitem x orders, clicks x purchases,
signatures x signatures) dominate shuffle volume. Writing both sides
bucketed by the join key (`bucketBy` + `sortBy` + `saveAsTable`) makes
every subsequent join/aggregation on that key exchange-free: the scan
itself is hash-partitioned, so SortMergeJoin runs directly on the
bucketed files. One shuffle at write time is amortized over every
downstream read — the batch analogue of a co-partitioned state store.

Bucket-count discipline: both sides must use the same `n_buckets`
(Spark joins bucketed tables shuffle-free only when counts match or
one divides the other with bucket coalescing enabled), and at scale
pick n_buckets so a bucket of the larger table fits an executor core
(e.g. 100 TB / 4096 buckets ~ 25 GB; prefer 8192+).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    n_buckets: int,
    path: str | None = None,
    sort_keys: Sequence[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (+ sorted-within-bucket) table.

    ``path`` makes it an external table (test-friendly); sort keys
    default to the bucket keys so merge joins skip the per-task sort.
    """
    w = (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *keys)
        .sortBy(*(sort_keys or keys))
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read back a bucketed table (bucket metadata comes from the
    catalog, so this must go through ``spark.table``, not raw paths)."""
    return spark.table(table)
