"""Dimension-history (SCD2) and native session-window queries.

The reference keeps no history — every dbt run rebuilds the marts in
place (news_sources.sql / news_authors.sql full refreshes). These
queries add the warehouse-standard type-2 history surface on the same
engine, plus the built-in ``session_window`` twin of the
applyInPandasWithState sessionizer (operators/sessionize.py) so the
gap-session semantics are covered by a pure-Catalyst path too.

Oracle notes: SCD2 is pure window algebra (lead/row_number), so the
DuckDB twin is exact; the incremental variant is verified against the
SAME full-history oracle — applying the post-cutoff batch onto the
pre-cutoff dimension must reproduce the from-scratch rebuild
bit-for-bit, which is precisely the invariant an incremental SCD2 job
must hold in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..operators.scd import scd2_apply_changes, scd2_history
from ..sources.registry import load_table
from .core import _dec
from .registry import register

_SCD2_ORACLE = """
    SELECT user_id, event_type, value,
           ts AS valid_from,
           lead(ts) OVER w AS valid_to,
           lead(ts) OVER w IS NULL AS is_current,
           CAST(row_number() OVER w AS INTEGER) AS version
    FROM events
    WHERE event_type = 'signup'
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
"""


@register(
    "scd2_user_history",
    _SCD2_ORACLE,
    doc="SCD2 build: change log -> (valid_from, valid_to, is_current, version) intervals",
)
def scd2_user_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 history from the signup change log: one hash exchange on
    user_id serves the lead() and the version row_number; half-open
    intervals, deterministic under equal timestamps via the event_id
    tiebreak."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "signup"
    )
    return scd2_history(
        ev,
        key_cols=["user_id"],
        ts_col="ts",
        attr_cols=["event_type", "value"],
        tiebreak_cols=["event_id"],
    )


@register(
    "scd2_incremental_apply",
    _SCD2_ORACLE,
    doc="incremental SCD2 merge: batch onto existing dim == from-scratch rebuild (oracle-checked invariant)",
)
def scd2_incremental_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental path: build the dimension from pre-cutoff
    changes, then apply the post-cutoff batch with
    ``scd2_apply_changes``. The oracle is the FULL-history rebuild —
    equality is the correctness invariant of incremental SCD2. Only
    keys present in the batch are rewritten (left-semi/anti split), so
    at scale the merge cost tracks the batch size, not the dimension."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "signup"
    )
    cutoff = F.lit("2024-01-20").cast("timestamp")
    # event_id rides along as an attr so the incremental rebuild can
    # tiebreak duplicate (user_id, ts) changes exactly like the full
    # rebuild / oracle do; it is dropped from the final projection.
    # persisted (r12): scd2_apply_changes consumes dim twice (the
    # left-semi/left-anti key split) — unpersisted, the whole
    # window-heavy scd2_history subtree planned and ran once per
    # branch (plan-verified: 5 events scans -> 3). In production the
    # dimension is a materialized table (a scan, which is why the
    # operator itself does not cache); here it is a computed subtree,
    # and the cache holds exactly the dimension the incremental merge
    # would read from storage.
    dim = scd2_history(
        ev.filter(F.col("ts") < cutoff),
        key_cols=["user_id"],
        ts_col="ts",
        attr_cols=["event_type", "value", "event_id"],
        tiebreak_cols=["event_id"],
    ).persist(StorageLevel.MEMORY_AND_DISK)
    batch = ev.filter(F.col("ts") >= cutoff).select(
        "user_id", "event_type", "value", "event_id",
        F.col("ts").alias("valid_from"),
    )
    merged = scd2_apply_changes(
        dim,
        batch,
        key_cols=["user_id"],
        ts_col="valid_from",
        tiebreak_cols=["event_id"],
    )
    return merged.select(
        "user_id", "event_type", "value", "valid_from", "valid_to",
        "is_current", "version",
    )


@register(
    "events_session_window_native",
    """
    WITH s AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ),
    sess AS (
      SELECT user_id, ts, value,
             CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
      FROM s
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM sess GROUP BY user_id, sid
    """,
    doc="built-in session_window gap sessions (Catalyst path; twin of the stateful sessionizer)",
)
def events_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``F.session_window`` computes the same 30-minute gap sessions as
    operators/sessionize.py but entirely inside Catalyst (works in
    batch AND streaming group-state). Window end is last-event + gap by
    definition — the oracle mirrors that. One exchange on (user_id)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
