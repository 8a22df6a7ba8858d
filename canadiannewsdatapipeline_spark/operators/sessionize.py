"""Event sessionization — the classic stateful stream operator, in
both batch and structured-streaming form.

Batch: the standard two-window formulation — ``lag`` detects gaps
larger than the timeout, a running ``sum`` over the gap flags numbers
sessions. Two passes over one hash-partition by user (same shuffle
reused: both windows share the partitioning, Catalyst plans one
Exchange). Fully SQL-expressible, so it carries a DuckDB oracle.

Streaming: ``applyInPandasWithState`` keeps per-user (last_ts,
session_count) state with a processing-time timeout — the shape the
reference's 3-hourly micro-batches would need if they were a true
stream (SURVEY.md §2.9).
"""

from __future__ import annotations

from datetime import datetime, timedelta
from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_MIN = 30


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = SESSION_GAP_MIN,
    tiebreakers: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Assign 1-based per-user session numbers: a new session starts
    when the gap to the previous event exceeds ``gap_minutes``."""
    order = [F.col(ts_col).asc()] + [F.col(t).asc() for t in tiebreakers]
    w = Window.partitionBy(user_col).orderBy(*order)
    # exact integer microseconds (unix_micros / DuckDB epoch_us) — no
    # engine-dependent truncation
    prev_us = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    gap_us = F.unix_micros(F.col(ts_col)) - prev_us
    new_session = F.when(
        prev_us.isNull() | (gap_us > gap_minutes * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = SESSION_GAP_MIN,
) -> DataFrame:
    """Per-session aggregates over the sessionized stream."""
    s = sessionize(df, user_col, ts_col, gap_minutes)
    return s.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (
            (F.max(F.unix_micros(F.col(ts_col))) - F.min(F.unix_micros(F.col(ts_col))))
            / F.lit(1_000_000)
        ).alias("duration_sec"),
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
    )


STATE_SCHEMA = "last_ts long, session_count long"
OUT_SCHEMA = "user_id long, session_id long, n_events long"


def streaming_sessionize(
    events_stream: DataFrame, gap_minutes: int = SESSION_GAP_MIN
):
    """Custom stateful streaming operator via applyInPandasWithState:
    per-user session counting with explicit state. Returns one row per
    (user, session) per micro-batch with the events counted so far.

    Event-time ordering within a batch is handled by sorting the batch;
    cross-batch ordering relies on the watermark upstream.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_sec = gap_minutes * 60

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        last_ts, session_count = state.get if state.exists else (None, 0)
        rows: list[tuple[int, int, int]] = []
        n_in_session = 0
        for pdf in pdfs:
            for ts in sorted(int(t.timestamp()) for t in pdf["ts"]):
                if last_ts is None or ts - last_ts > gap_sec:
                    if session_count > 0 and n_in_session:
                        rows.append((user_id, session_count, n_in_session))
                    session_count += 1
                    n_in_session = 0
                last_ts = ts
                n_in_session += 1
        if n_in_session:
            rows.append((user_id, session_count, n_in_session))
        state.update((last_ts, session_count))
        yield pd.DataFrame(rows, columns=["user_id", "session_id", "n_events"])

    return events_stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
