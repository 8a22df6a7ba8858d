"""Warehouse-side sinks/sources (SURVEY.md §2.1 S10/S11/S13/S17).

The reference stages pandas frames through headerless CSV with a
forced column order and bulk-COPYs them into Postgres
(newsairflowtasks.py:55-95). Spark-native: parquet is the primary
store (columnar, splittable, predicate-pushdown); CSV and JDBC
wrappers keep wire-compatibility with the reference's formats.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RAW_NEWS_COLUMNS = (
    "id source_name source_country category author author_email author_url "
    "title description url publishedat article_content bias language ingest_ts"
).split()


def write_staging_csv(
    df: DataFrame, path: str, column_order: Sequence[str], add_ingest_ts: bool = True
) -> None:
    """S10: forced column order + ingest timestamp, headerless CSV
    (newsairflowtasks.py:55-71)."""
    if add_ingest_ts and "ingest_ts" in column_order and "ingest_ts" not in df.columns:
        df = df.withColumn("ingest_ts", F.current_timestamp())
    df.select(*column_order).write.mode("overwrite").option("header", "false").csv(path)


def read_staging_csv(
    spark: SparkSession, path: str, schema_ddl: str
) -> DataFrame:
    return spark.read.schema(schema_ddl).option("header", "false").csv(path)


def append_raw(df: DataFrame, path: str, partition_by: Sequence[str] = ()) -> None:
    """S11 equivalent: bulk append to the columnar raw store. Marts are
    date-partitioned downstream; raw appends stay unpartitioned
    (small-files risk beats partition pruning at the raw layer)."""
    writer = df.write.mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    predicates: Sequence[str] = (),
    **options: str,
) -> DataFrame:
    """S13: parameterized SQL source. ``predicates`` become per-
    partition WHERE clauses so the read parallelizes across executors
    (the reference's single-connection get_pandas_df cannot)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in options.items():
        reader = reader.option(k, v)
    if predicates:
        reader = reader.option("partitionColumn", options.get("partitionColumn", ""))
    return reader.load()


def write_jdbc(df: DataFrame, url: str, table: str, mode: str = "append", **options: str) -> None:
    """S11/S17: batched JDBC append — the COPY-equivalent bulk path."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table).mode(mode)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()


def compact_small_files(
    spark, in_dir: str, out_dir: str, target_files: int
) -> int:
    """Small-file compaction — the maintenance job every file-based
    lake needs: N tiny parquet files (per-trigger streaming output,
    over-parallel writes) rewritten as ``target_files`` larger ones.
    Reads once, coalesces WITHOUT a shuffle (coalesce, not
    repartition — merging files needs no redistribution), writes
    once. Returns the output file count. At scale pick target_files =
    total_bytes / 128 MB and run per partition directory so the
    rewrite parallelizes across partitions."""
    df = spark.read.parquet(in_dir)
    df.coalesce(target_files).write.mode("overwrite").parquet(out_dir)
    # Count output files through Spark so the check works on any
    # Hadoop-visible filesystem (s3a://, hdfs://, local) and descends
    # into partition subdirectories — os.listdir would do neither.
    return len(spark.read.parquet(out_dir).inputFiles())
