"""Training-corpus assembly queries (BASELINE.json extensions):
deterministic splits, weighted source mixing, token-budget shard
packing, eval contamination, and the as-of join — the steps a 100 TB
LLM data pipeline runs between cleaning and shard writing.

All assignments are md5-hash-deterministic (no RNG) so the DuckDB
oracles are exact and re-runs are reproducible; the as-of oracle uses
DuckDB's native ``ASOF LEFT JOIN`` against the union+window Spark
formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join, dedup_right_ties
from ..operators.training import (
    contamination_check,
    pack_token_shards,
    train_val_test_split,
    weighted_source_mix,
)
from ..sources.registry import load_table
from .registry import register

# pct 0-99 from the first 8 md5 hex chars of the id — the shared
# deterministic-split primitive (operators/training.py:_hash_pct)
_PCT = "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100"

_MIX_WEIGHTS = {"src0": 0.5, "src1": 0.2}
_MIX_DEFAULT = 0.8


@register(
    "train_val_test_split",
    f"""
    SELECT doc_id, source,
           CASE WHEN {_PCT} < 80 THEN 'train'
                WHEN {_PCT} < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
    doc="deterministic hash split: stable under corpus growth, no RNG",
)
def train_val_test_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return train_val_test_split(docs, "doc_id").select("doc_id", "source", "split")


@register(
    "mix_weighted_sample",
    f"""
    SELECT doc_id, source
    FROM documents
    WHERE {_PCT} < (CASE WHEN source = 'src0' THEN 0.5
                         WHEN source = 'src1' THEN 0.2
                         ELSE 0.8 END) * 100
    """,
    doc="weighted source mixing as a pure deterministic filter (no shuffle)",
)
def mix_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return weighted_source_mix(
        docs, "doc_id", "source", _MIX_WEIGHTS, default_weight=_MIX_DEFAULT
    ).select("doc_id", "source")


@register(
    "pack_token_shards",
    r"""
    WITH t AS (
      SELECT doc_id, source,
             len(regexp_extract_all(text, '\S+')) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, source, n_tokens,
             CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id ASC
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM t
    )
    SELECT doc_id AS id, source AS grp, n_tokens,
           CAST(FLOOR(CAST(cum - n_tokens AS DOUBLE) / 2048) AS BIGINT) AS shard_id
    FROM c
    """,
    doc="token-budget shard packing: per-group cumulative token offsets",
)
def pack_token_shards_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return pack_token_shards(docs, "doc_id", "text", "source", budget=2048)


@register(
    "contamination_check",
    """
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS t FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id AS id,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
             t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7] AS shingle
      FROM toks, (SELECT unnest(generate_series(1, 200)) AS i) g
      WHERE i <= len(t) - 7
    ),
    ev AS (SELECT id, shingle FROM sh WHERE id % 20 = 0),
    tr AS (SELECT DISTINCT shingle FROM sh WHERE id % 20 <> 0),
    hits AS (
      SELECT ev.id, COUNT(*) AS n_contaminated
      FROM ev JOIN tr ON ev.shingle = tr.shingle GROUP BY 1
    ),
    tot AS (SELECT id, COUNT(*) AS n_shingles FROM ev GROUP BY 1)
    SELECT t.id, t.n_shingles,
           COALESCE(h.n_contaminated, 0) AS n_contaminated,
           CAST(COALESCE(h.n_contaminated, 0) AS DOUBLE) / t.n_shingles
             AS contamination_ratio
    FROM tot t LEFT JOIN hits h ON h.id = t.id
    """,
    doc="eval-set contamination: 8-gram overlap vs train side (equi-join shape)",
)
def contamination_check_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return contamination_check(
        docs, "doc_id", "text", F.col("doc_id") % 20 == 0, n=8
    )


@register(
    "events_asof_attribution",
    """
    WITH v AS (
      SELECT user_id, ts, event_id AS view_event_id
      FROM (
        SELECT user_id, ts, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'view'
      ) WHERE rn = 1
    ),
    p AS (
      SELECT event_id, user_id, ts, value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
           p.value AS purchase_value,
           v.view_event_id, v.ts AS view_ts,
           (epoch_us(p.ts) - epoch_us(v.ts)) / 1000000 AS gap_sec
    FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
    doc="as-of join (union+window, single shuffle) vs DuckDB native ASOF JOIN",
)
def events_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    views = dedup_right_ties(
        ev.filter(F.col("event_type") == "view").select("user_id", "ts", "event_id"),
        ["user_id"],
        "ts",
        "event_id",
    ).withColumnRenamed("event_id", "view_event_id")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    joined = asof_join(
        purchases, views, ["user_id"], "ts", "ts", ["view_event_id"]
    )
    gap = (
        F.unix_micros(F.col("ts")) - F.unix_micros(F.col("asof_ts"))
    ) / F.lit(1_000_000)
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
        "view_event_id",
        F.col("asof_ts").alias("view_ts"),
        gap.alias("gap_sec"),
    )
