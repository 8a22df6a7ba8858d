"""Stream-stream join: the watermarked incremental join must produce
exactly the batch join's rows (AvailableNow drains the whole source,
so no rows may be lost to state eviction with an in-order replay)."""

from __future__ import annotations

from canadiannewsdatapipeline_spark.sources.registry import load_table
from canadiannewsdatapipeline_spark.streaming.joins import (
    click_purchase_join,
    stream_stream_click_purchase,
)

SF = "/root/testdata/sf0.001"


def test_stream_stream_join_matches_batch(spark):
    ev = load_table(spark, SF, "events")
    batch = click_purchase_join(
        ev.filter("event_type = 'click'"),
        ev.filter("event_type = 'purchase'"),
    )
    stream = stream_stream_click_purchase(spark, f"{SF}/events.parquet")
    key = ["click_id", "purchase_id"]
    b = {tuple(r) for r in batch.select(*key).collect()}
    s = {tuple(r) for r in stream.select(*key).collect()}
    assert len(b) > 0  # the fixture data must actually exercise the join
    assert s == b
