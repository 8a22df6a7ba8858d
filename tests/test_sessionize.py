"""Sessionization: batch windows vs the stateful streaming operator."""

from __future__ import annotations

from datetime import datetime, timedelta

from canadiannewsdatapipeline_spark.operators.sessionize import (
    session_stats,
    sessionize,
    streaming_sessionize,
)

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _events(spark):
    rows = [
        # user 1: two sessions (40-minute gap between event 2 and 3)
        (1, 1, T0, 1.0),
        (2, 1, T0 + timedelta(minutes=10), 2.0),
        (3, 1, T0 + timedelta(minutes=50), 3.0),
        # user 2: one session
        (4, 2, T0, 4.0),
        (5, 2, T0 + timedelta(minutes=29), 5.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )


def test_sessionize_batch(spark):
    out = sessionize(_events(spark), gap_minutes=30)
    got = {r.event_id: r.session_id for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 1, 5: 1}

    stats = session_stats(_events(spark), gap_minutes=30)
    s11 = stats.filter("user_id = 1 AND session_id = 1").first()
    assert s11.n_events == 2 and s11.duration_sec == 600.0
    assert s11.total_value == 3.0


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    _events(spark).write.parquet(src)
    stream = spark.readStream.schema(_events(spark).schema).parquet(src)
    sessions = streaming_sessionize(stream, gap_minutes=30)
    sink = "stream_sessions_test"
    (
        sessions.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {
        (r.user_id, r.session_id): r.n_events for r in spark.table(sink).collect()
    }
    batch = {
        (r.user_id, r.session_id): r.n_events
        for r in session_stats(_events(spark), gap_minutes=30).collect()
    }
    assert got == batch
