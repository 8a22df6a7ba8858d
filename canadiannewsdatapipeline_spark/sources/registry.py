"""Parquet table registry over the driver's synthetic warehouse.

The reference reads row-oriented Postgres tables via SQL strings
(sentiment_dashboard.py:30-83, sentiment_batch_job_tasks.py:36-64);
our engine reads columnar parquet so Catalyst gets predicate pushdown,
column pruning, and row-group skipping for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Columns written as parquet TIMESTAMP(NANOS), which the Spark reader
# rejects. We read them as raw nanosecond longs and truncate to
# microsecond timestamps (matching DuckDB's TIMESTAMP_NS -> TIMESTAMP
# coercion of the same files).
_NANOS_TS_COLS = {"events": ("ts",)}


# The per-session {path: (mtime, DataFrame)} plan cache lives ON the
# session object as a private attribute, not in a module-global map. A
# DataFrame is an immutable logical plan, so handing the same object to
# every query is safe; the mtime invalidates when a warehouse is
# regenerated in place (the fuzzer does this) and the stale entry is
# REPLACED, not accumulated, so the cache is bounded by table paths.
# Why an attribute and not a WeakKeyDictionary keyed on the session:
# every cached DataFrame strongly references its SparkSession
# (pyspark/sql/classic/dataframe.py `self._session`), and a weak-keyed
# map still holds its VALUES strongly, so a value that refers back to
# its key pins the key forever — the documented WeakKeyDictionary
# caveat. As a session attribute the whole cache is a pure
# session -> dict -> DataFrame -> session reference cycle with no
# global root, so the cycle collector reclaims a dropped session and
# all its plans, and a restarted session can never collide with a
# stale plan bound to a stopped SparkContext. The listing/schema
# inference — several py4j round-trips + a footer read per table per
# query — still happens once per session instead of once per call.
_CACHE_ATTR = "_cndp_table_cache"
_PINNED_ATTR = "_cndp_confs_pinned"


def _pin_session_confs(spark: SparkSession, repin: bool = False) -> None:
    """Pin the runtime confs every query depends on: UTC session TZ
    (timestamp literals/epoch constructors match the DuckDB oracle) and
    nanosAsLong (events.ts physical type). The grading driver may hand
    us a session it built itself. Each conf.set is a py4j round trip,
    so the hot path (memoized table hits) runs this once per session;
    cold loads (new table / regenerated warehouse) pass repin=True to
    re-assert the confs in case co-resident code changed them since —
    partial self-healing at every load boundary without per-call
    chatter."""
    if getattr(spark, _PINNED_ATTR, False) and not repin:
        return
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    setattr(spark, _PINNED_ATTR, True)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _pin_session_confs(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    mtime = os.path.getmtime(path)
    per_session = getattr(spark, _CACHE_ATTR, None)
    if per_session is None:
        per_session = {}
        setattr(spark, _CACHE_ATTR, per_session)
    hit = per_session.get(path)
    if hit is not None and hit[0] == mtime:
        return hit[1]
    _pin_session_confs(spark, repin=True)
    df = spark.read.parquet(path)
    for col in _NANOS_TS_COLS.get(name, ()):
        dt = dict(df.dtypes).get(col)
        if dt == "bigint":
            # integer DIV: float division would lose precision on e18-scale longs
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` DIV 1000")))
        elif dt == "timestamp_ntz":
            # parquet TIMESTAMP(isAdjustedToUTC=false) surfaces as NTZ in
            # Spark 4; with the session TZ pinned to UTC this cast keeps the
            # wall-clock instant and restores epoch functions (unix_micros
            # rejects NTZ).
            df = df.withColumn(col, F.col(col).cast("timestamp"))
        elif dt != "timestamp":
            # the physical type of this column has changed across test-
            # data regenerations before (NANOS->bigint, then NTZ); fail
            # loudly on a third variant instead of silently mis-reading
            raise TypeError(
                f"{name}.{col}: unhandled parquet-surfaced dtype {dt!r} — "
                "extend _NANOS_TS_COLS normalization in sources/registry.py"
            )
    per_session[path] = (mtime, df)
    return df


def load_table_raw(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """``load_table`` minus the timestamp normalization: the parquet
    file's surfaced schema, memoized per session. The streaming twins
    need this — a readStream must be given the file's RAW read schema
    (nanos longs / NTZ as they surface), with normalization applied
    inside the stream (`streaming.ingest._normalize_ts`). Re-reading
    per call costs a footer read + several py4j round trips; this
    shares the session cache under a distinct key."""
    _pin_session_confs(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    key = path + "#raw"
    mtime = os.path.getmtime(path)
    per_session = getattr(spark, _CACHE_ATTR, None)
    if per_session is None:
        per_session = {}
        setattr(spark, _CACHE_ATTR, per_session)
    hit = per_session.get(key)
    if hit is not None and hit[0] == mtime:
        return hit[1]
    _pin_session_confs(spark, repin=True)
    df = spark.read.parquet(path)
    per_session[key] = (mtime, df)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every warehouse table as a temp view (for spark.sql)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
