"""Streaming CDC-apply: foreachBatch + merge_upsert must converge to
the same state as a single batch merge of all change records."""

from __future__ import annotations

from pyspark.sql import functions as F

from canadiannewsdatapipeline_spark.operators.dedup_window import latest_row_per_key
from canadiannewsdatapipeline_spark.operators.merge import merge_upsert
from canadiannewsdatapipeline_spark.streaming.ingest import streaming_upsert_sink


def _changes(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, seq long")


def _stage_file(spark, rows, src: str, name: str) -> None:
    """The file stream source lists flat files, not nested write dirs —
    stage the single part file under its own name."""
    import glob
    import os
    import shutil

    tmp = f"{src}_stage"
    _changes(spark, rows).coalesce(1).write.mode("overwrite").parquet(tmp)
    os.makedirs(src, exist_ok=True)
    shutil.copy(glob.glob(f"{tmp}/part-*.parquet")[0], f"{src}/{name}.parquet")
    shutil.rmtree(tmp)


def test_streaming_upsert_matches_batch_merge(spark, tmp_path):
    src = str(tmp_path / "cdc_src")
    # file 1: initial inserts; file 2: update k=1, new k=3; file 3: update k=3
    _stage_file(spark, [(1, "a", 1), (2, "b", 1)], src, "f1")
    _stage_file(spark, [(1, "a2", 2), (3, "c", 2)], src, "f2")
    _stage_file(spark, [(3, "c2", 3)], src, "f3")

    target = str(tmp_path / "target")
    streaming_upsert_sink(
        spark,
        src,
        "k long, v string, seq long",
        keys=["k"],
        order_col="seq",
        target_dir=target,
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,  # force multiple micro-batches
    )
    got = {r.k: (r.v, r.seq) for r in spark.read.parquet(target).collect()}
    assert got == {1: ("a2", 2), 2: ("b", 1), 3: ("c2", 3)}

    # equivalence: one-shot batch merge over the deduped full log
    log = spark.read.parquet(src)
    latest = latest_row_per_key(log, keys=["k"], ts_col="seq", tiebreakers=["v"])
    empty = spark.createDataFrame([], "k long, v string, seq long")
    batch_state = {r.k: (r.v, r.seq) for r in merge_upsert(empty, latest, ["k"]).collect()}
    assert got == batch_state


def test_streaming_upsert_checkpoint_idempotent(spark, tmp_path):
    src = str(tmp_path / "src")
    _stage_file(spark, [(1, "x", 1)], src, "f1")
    target = str(tmp_path / "t")
    ckpt = str(tmp_path / "c")
    for _ in range(2):  # second run: checkpoint says nothing new
        streaming_upsert_sink(
            spark, src, "k long, v string, seq long",
            keys=["k"], order_col="seq", target_dir=target, checkpoint_dir=ckpt,
        )
    rows = spark.read.parquet(target).collect()
    assert [(r.k, r.v) for r in rows] == [(1, "x")]
