"""Structured Streaming surface tests (SURVEY.md §2.9)."""

from __future__ import annotations

from datetime import datetime, timedelta

from canadiannewsdatapipeline_spark.streaming import streaming_file_ingest


def test_streaming_ingest_idempotent_dedup(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t0 = datetime(2024, 1, 1, 0, 0, 0)
    batch1 = spark.createDataFrame(
        [(1, "a", t0), (2, "b", t0 + timedelta(minutes=5)),
         (2, "b", t0 + timedelta(minutes=5))],  # in-batch duplicate
        "id long, v string, ts timestamp",
    )
    batch1.write.mode("append").parquet(src)
    schema = batch1.schema
    streaming_file_ingest(spark, src, schema, ["id"], "ts", ckpt, out)
    assert spark.read.parquet(out).count() == 2  # dup dropped

    # second cron tick: new file arrives; old files NOT reprocessed
    spark.createDataFrame(
        [(3, "c", t0 + timedelta(hours=1))], schema
    ).write.mode("append").parquet(src)
    streaming_file_ingest(spark, src, schema, ["id"], "ts", ckpt, out)
    got = sorted(r.id for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3]


def test_streaming_session_window_matches_batch(spark, tmp_path):
    # native session_window must produce the same gap sessions whether
    # the engine runs it as one batch or incrementally with watermarked
    # state (AvailableNow drains the source then finalizes all windows)
    import uuid

    from pyspark.sql import functions as F

    from canadiannewsdatapipeline_spark.sources.registry import load_table
    from canadiannewsdatapipeline_spark.streaming.ingest import _state_partitions

    sf_dir = "/root/testdata/sf0.001"
    ev = load_table(spark, sf_dir, "events")

    def sessions(frame):
        return frame.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("sw")
        ).agg(F.count(F.lit(1)).alias("n_events"))

    batch = {
        (r.user_id, r.sw.start, r.sw.end, r.n_events)
        for r in sessions(ev).collect()
    }

    # append-mode windows only emit once the watermark passes their
    # close; the last session per user would stay buffered at
    # end-of-stream. A far-future sentinel row advances the global
    # watermark past every real session (excluded from the compare).
    src = str(tmp_path / "events_src")
    ev.write.mode("overwrite").parquet(src)
    sentinel_ts = ev.agg(F.max("ts")).collect()[0][0] + __import__(
        "datetime"
    ).timedelta(hours=2)
    spark.createDataFrame(
        [(-1, sentinel_ts, -1, "sentinel", 0.0, "{}")], ev.schema
    ).write.mode("append").parquet(src)

    from canadiannewsdatapipeline_spark.streaming.joins import _event_stream

    stream = _event_stream(spark, src).withWatermark("ts", "1 minute")
    sink = f"ssw_{uuid.uuid4().hex[:8]}"
    with _state_partitions(spark, 4):
        (
            sessions(stream)
            .select("user_id", "sw.start", "sw.end", "n_events")
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    streamed = {
        (r.user_id, r.start, r.end, r.n_events)
        for r in spark.table(sink).collect()
        if r.user_id != -1
    }
    assert streamed == batch and len(batch) > 0
