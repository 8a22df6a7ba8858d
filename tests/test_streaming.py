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
