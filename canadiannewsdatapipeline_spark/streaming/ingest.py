"""Structured Streaming surface (SURVEY.md §2.9).

The reference has no true streams — ingestion is a 3-hourly Airflow
cron (ingest_news.py:82) with overlap re-scrapes deduped downstream
and a temp-file retry branch (S12). Natively in Spark:

- ``streaming_file_ingest``: file-source readStream +
  ``Trigger.AvailableNow`` reproduces "process whatever arrived since
  last run, exactly once" (checkpoint = the reference's temp-file
  idempotency), with watermark + dropDuplicates replacing the
  downstream latest-row dedup.
- ``windowed_event_counts``: tumbling-window aggregation over the
  events stream — the streaming twin of the dashboard's daily
  resample (A7).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def streaming_file_ingest(
    spark: SparkSession,
    src_dir: str,
    schema,
    dedup_keys: list[str],
    ts_col: str,
    checkpoint_dir: str,
    out_dir: str,
    watermark: str = "3 hours",
) -> None:
    """Incremental exactly-once file ingest with in-stream dedup.

    Runs to completion (AvailableNow) — the reference's cron semantics;
    re-running with the same checkpoint skips already-ingested files.
    """
    stream = (
        spark.readStream.schema(schema)
        .parquet(src_dir)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(dedup_keys)
    )
    (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def windowed_event_counts(
    spark: SparkSession, events: DataFrame, window: str = "1 hour"
) -> DataFrame:
    """Tumbling-window count + exact-decimal sum per event_type,
    executed by the streaming engine (AvailableNow over the same
    parquet, complete-mode memory sink) and returned as a batch frame.

    The decimal sum keeps the aggregate engine-exact (same rule as the
    batch corpus)."""
    sink = f"wec_{uuid.uuid4().hex[:12]}"
    stream = spark.readStream.schema(events.schema).parquet(
        events.inputFiles()[0].rsplit("/", 1)[0]
    )
    # events.ts arrives as nanosecond longs (see sources.registry);
    # apply the same conversion inside the stream.
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    agg = (
        stream.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )
    (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.table(sink)


def stream_static_enrich(
    spark: SparkSession,
    events: DataFrame,
    dim: DataFrame,
    join_expr,
    segment_col: str,
    window: str = "1 hour",
) -> DataFrame:
    """Stream-static join + tumbling agg: each micro-batch joins the
    static dimension (broadcast — the dim is re-read per batch, so keep
    it dimension-sized), then windows into per-segment counts and an
    exact-decimal value sum.

    This is the streaming twin of the batch enrich-join (J1): at scale
    the stream side never shuffles for the join (broadcast), only for
    the windowed aggregation — one exchange per micro-batch."""
    sink = f"sse_{uuid.uuid4().hex[:12]}"
    stream = spark.readStream.schema(events.schema).parquet(
        events.inputFiles()[0].rsplit("/", 1)[0]
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    agg = (
        stream.join(F.broadcast(dim), join_expr(stream, dim))
        .groupBy(F.window("ts", window).alias("w"), F.col(segment_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col(segment_col).alias("segment"),
            "n",
            "total_value",
        )
    )
    (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.table(sink)
