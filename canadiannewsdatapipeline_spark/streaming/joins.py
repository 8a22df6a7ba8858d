"""Stream-stream joins (Structured Streaming's hardest stateful op).

The batch twin is operators/asof.py's click->purchase attribution; this
is the same semantics running incrementally: two event streams, inner
equi-join on user_id with an event-time range bound, watermarks on BOTH
sides so the join state is evictable (without them the state store
grows forever — the #1 operational failure of streaming joins at
scale). State is hash-partitioned by user_id across executors; the
range condition lets Spark drop buffered rows older than
watermark - bound.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _event_stream(spark: SparkSession, events_path: str) -> DataFrame:
    # events.parquet carries TIMESTAMP(NANOS): stream it with the raw
    # nanos-as-long schema and convert with integer DIV (see
    # sources/registry.py — same rule as the batch loader). The raw
    # frame is the session-memoized one (conf pinning + footer read
    # once per session).
    import os

    from ..sources.registry import _pin_session_confs, load_table_raw

    if events_path.endswith(".parquet") and os.path.isfile(events_path):
        raw = load_table_raw(
            spark,
            os.path.dirname(events_path),
            os.path.basename(events_path).removesuffix(".parquet"),
        )
    else:
        # directory source (ingest-style): not a registry table; read
        # directly with the session confs pinned
        _pin_session_confs(spark, repin=True)
        raw = spark.read.parquet(events_path)
    reader = spark.readStream.schema(raw.schema)
    # FileStreamSource wants a directory; a single-file path becomes
    # parent dir + pathGlobFilter so only that file is streamed.
    if os.path.isfile(events_path):
        d, base = os.path.split(events_path)
        reader = reader.option("pathGlobFilter", base)
        events_path = d
    stream = reader.parquet(events_path)
    from .ingest import _normalize_ts

    return _normalize_ts(stream)


def click_purchase_join(
    left: DataFrame, right: DataFrame, within_minutes: int = 30
) -> DataFrame:
    """Inner join: each click row pairs with every purchase by the same
    user within [click_ts, click_ts + within]. Identical expression
    works for batch frames and watermarked streams."""
    c = left.select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = right.select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return c.join(
        p,
        (c.user_id == p.p_user_id)
        & (p.purchase_ts >= c.click_ts)
        & (p.purchase_ts <= c.click_ts + F.expr(f"INTERVAL {within_minutes} MINUTES")),
    ).select(
        "user_id", "click_id", "purchase_id", "click_ts", "purchase_ts",
        "purchase_value",
    )


def stream_stream_click_purchase(
    spark: SparkSession,
    events_path: str,
    within_minutes: int = 30,
    state_partitions: int = 8,
) -> DataFrame:
    """Run the click->purchase range join as a true stream-stream join
    (AvailableNow over the events parquet, both sides watermarked) and
    return the materialized result.

    Watermark choice: the purchase side buffers at most
    `within_minutes` past its watermark; the click side can evict
    anything older than watermark + bound. 1 hour >> the 30-minute
    bound keeps eviction correct with late data."""
    sink = f"ssj_{uuid.uuid4().hex[:12]}"
    s = _event_stream(spark, events_path)
    clicks = s.filter(F.col("event_type") == "click").withWatermark("ts", "1 hour")
    purchases = s.filter(F.col("event_type") == "purchase").withWatermark("ts", "1 hour")
    out = click_purchase_join(clicks, purchases, within_minutes)
    from .ingest import _state_partitions

    # join state is keyed by user_id — size the state store to that
    # cardinality, not the batch shuffle width (see ingest.py)
    with _state_partitions(spark, state_partitions):
        (
            out.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    return spark.table(sink)
