"""Relational operator corpus (SURVEY.md §2.2-§2.8) over the driver's
TPC-H-ish warehouse, each with a DuckDB oracle.

Cross-engine determinism rules used throughout (SURVEY.md §7.4):

- Aggregates over floating-point money columns are computed as exact
  DECIMAL sums and only then cast to DOUBLE — double summation order
  differs between engines, decimal summation cannot.
- Every window / top-K has an explicit total-order tiebreaker.
- Averages are exact-decimal-sum / count (one deterministic IEEE
  division) rather than native ``avg``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.cleaning import EMAIL_PATTERN, PUNCT_CLASS
from ..functions.keys import surrogate_key
from ..operators.backfill import backfill_within_group, disjunctive_group_min
from ..operators.dedup_window import (
    distinct_on,
    keep_first_by_order,
    latest_row_per_key,
    top_n_per_group,
)
from ..operators.timeseries import daily_resample
from ..operators.topk import top_k_words
from ..sources.registry import load_table
from .registry import register


def _dec(col, prec: int = 12, scale: int = 2):
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({prec},{scale})")


def _dsum(col, prec: int = 12, scale: int = 2):
    """Exact decimal sum rendered as double — engine-portable."""
    return F.sum(_dec(col, prec, scale)).cast("double")


# ---------------------------------------------------------------------------
# Q1 analog — TPC-H Q1 pricing summary (A4 group-avg + F19/F20 casts).
# Reference shape: sentiment_dashboard.py:194-199 (group-by multi-agg).
# ---------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
                    * (CAST(1.00 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    one = F.lit("1.00").cast("decimal(3,2)")
    disc_price = _dec("l_extendedprice") * (one - _dec("l_discount", 4, 2))
    charge = disc_price * (one + _dec("l_tax", 4, 2))
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity").alias("sum_qty"),
            _dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (_dsum("l_quantity") / n).alias("avg_qty"),
            (_dsum("l_extendedprice") / n).alias("avg_price"),
            (_dsum("l_discount", 4, 2) / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Q2 analog — dashboard Q1 (J3 left-join chain + A3 DISTINCT ON + P5 BETWEEN,
# sentiment_dashboard.py:36-49): latest lineitem per order joined to
# customer/nation dims.
# ---------------------------------------------------------------------------
@register(
    "q2_enriched_join_dedup",
    """
    WITH latest AS (
      SELECT l_orderkey, l_linenumber, l_extendedprice,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                ORDER BY l_linenumber DESC, l_extendedprice DESC) AS rn
      FROM lineitem
    )
    SELECT o.o_orderkey, o.o_orderdate, o.o_totalprice, o.o_orderpriority,
           c.c_name, n.n_name AS nation_name,
           l.l_linenumber AS last_linenumber,
           l.l_extendedprice AS last_price
    FROM orders o
    JOIN latest l ON l.l_orderkey = o.o_orderkey AND l.rn = 1
    LEFT JOIN customer c ON c.c_custkey = o.o_custkey
    LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
    """,
)
def q2_enriched_join_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    filtered_orders = orders.filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("1996-12-31").cast("timestamp"),
        )
    )
    # Semi-join prune BEFORE the window: the date filter keeps ~15% of
    # orders, and since the window partitions by l_orderkey, dropping
    # whole keys up front cannot change any surviving key's result. At
    # 100x scale this is the difference between ranking the full fact
    # table and ranking only qualifying orders; the semi join, the
    # window, and the final join all hash on orderkey so the exchange
    # is paid once (plan-asserted in tests/test_physical_plans.py).
    pruned = li.select("l_orderkey", "l_linenumber", "l_extendedprice").join(
        filtered_orders.select("o_orderkey"),
        F.col("l_orderkey") == F.col("o_orderkey"),
        "left_semi",
    )
    # l_linenumber alone is not a total order per orderkey in the
    # synthetic data; l_extendedprice breaks the remaining ties.
    latest = latest_row_per_key(
        pruned,
        keys=["l_orderkey"],
        ts_col="l_linenumber",
        tiebreakers=["l_extendedprice"],
    )
    return (
        filtered_orders
        .join(latest, orders.o_orderkey == latest.l_orderkey)
        # customer grows with sf — no pinned broadcast; AQE picks BHJ while
        # it fits the threshold and falls back to SMJ at scale.
        .join(cust, orders.o_custkey == cust.c_custkey, "left")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey, "left")
        .select(
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "o_orderpriority",
            "c_name",
            F.col("n_name").alias("nation_name"),
            F.col("l_linenumber").alias("last_linenumber"),
            F.col("l_extendedprice").alias("last_price"),
        )
    )


# ---------------------------------------------------------------------------
# Q3 analog — bias histogram (A5 value_counts, sentiment_dashboard.py:263).
# ---------------------------------------------------------------------------
@register(
    "q3_value_counts",
    """
    SELECT event_type, COUNT(*) AS n,
           COUNT(CASE WHEN value > 10 THEN 1 END) AS n_big
    FROM events GROUP BY event_type
    """,
)
def q3_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("value") > 10, 1)).alias("n_big"),
    )


# ---------------------------------------------------------------------------
# Q6 analog — overall mean ± sample std (A6, sentiment_dashboard.py:349-359).
# Manual moment formula over exact decimal sums so both engines do the
# identical double arithmetic.
# ---------------------------------------------------------------------------
@register(
    "q6_mean_std",
    """
    WITH s AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sm,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))
                      * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sq
      FROM orders
    )
    SELECT n, sm / n AS mean_price,
           SQRT((sq - sm * sm / n) / (n - 1)) AS std_price
    FROM s
    """,
)
def q6_mean_std(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    p = _dec("o_totalprice", 18, 2)
    s = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(p).cast("double").alias("sm"),
        F.sum(p * p).cast("double").alias("sq"),
    )
    return s.select(
        "n",
        (F.col("sm") / F.col("n")).alias("mean_price"),
        F.sqrt(
            (F.col("sq") - F.col("sm") * F.col("sm") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("std_price"),
    )


# ---------------------------------------------------------------------------
# Q7 analog — daily resample with gap-filled date spine (A7,
# sentiment_dashboard.py:296-300).
# ---------------------------------------------------------------------------
@register(
    "q7_daily_timeseries",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_value
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), bounds AS (
      SELECT CAST(MIN(ts) AS DATE) AS lo, CAST(MAX(ts) AS DATE) AS hi
      FROM events WHERE event_type = 'purchase'
    ), spine AS (
      SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
      FROM bounds
    )
    SELECT s.day, d.n, d.avg_value
    FROM spine s LEFT JOIN daily d ON d.day = s.day
    """,
)
def q7_daily_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return daily_resample(
        ev,
        "ts",
        [
            (F.count(F.lit(1)), "n"),
            (_dsum("value") / F.count(F.lit(1)), "avg_value"),
        ],
    )


# ---------------------------------------------------------------------------
# Q8 analog — top-50 word frequency (A8/UD3, sentiment_dashboard.py:138-166).
# ---------------------------------------------------------------------------
_STOPWORDS = ("a", "the")


@register(
    "q8_top_words",
    f"""
    SELECT w.word, COUNT(*) AS n
    FROM documents d,
         unnest(regexp_extract_all(lower(d.text), '[a-z]+')) AS w(word)
    WHERE w.word NOT IN {_STOPWORDS!r}
    GROUP BY w.word
    ORDER BY n DESC, w.word ASC
    LIMIT 50
    """.replace("'a', 'the'", "'a', 'the'"),
)
def q8_top_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return top_k_words(docs, "text", k=50, stopwords=_STOPWORDS)


# ---------------------------------------------------------------------------
# P-family — casts/renames + predicate battery (P1, P3-P6, P8;
# stg_articles.sql:7-23, sentiment_batch_job_tasks.py:46-57).
# ---------------------------------------------------------------------------
@register(
    "p_filter_project",
    """
    SELECT doc_id AS document_id,
           CAST(source AS VARCHAR) AS source_name,
           CAST(n_chars AS BIGINT) AS content_length,
           lang AS language
    FROM documents
    WHERE lang = 'en'
      AND n_chars >= 200
      AND text LIKE '%spark%'
      AND source NOT IN ('src0')
      AND length(text) >= 20
    """,
)
def p_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(
            (F.col("lang") == "en")
            & (F.col("n_chars") >= 200)
            & F.col("text").contains("spark")
            & ~F.col("source").isin("src0")
            & (F.length("text") >= 20)
        )
        .select(
            F.col("doc_id").alias("document_id"),
            F.col("source").cast("string").alias("source_name"),
            F.col("n_chars").cast("long").alias("content_length"),
            F.col("lang").alias("language"),
        )
    )


# ---------------------------------------------------------------------------
# P12 — per-group top-N (the reference's per-source links[:n] slice,
# get_news.py:338-340), distributed via row_number.
# ---------------------------------------------------------------------------
@register(
    "p12_top_n_per_group",
    """
    SELECT o_custkey, o_orderkey, rn FROM (
      SELECT o_custkey, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey ASC) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def p12_top_n_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return top_n_per_group(
        o,
        keys=["o_custkey"],
        order=[F.col("o_orderdate").desc(), F.col("o_orderkey").asc()],
        n=3,
    ).select("o_custkey", "o_orderkey", "rn")


# ---------------------------------------------------------------------------
# J2/A1 — latest-row-per-key dedup (articles.sql:36-58 rewrite).
# ---------------------------------------------------------------------------
@register(
    "j2_latest_row_per_key",
    """
    SELECT user_id, event_id, event_type, value FROM (
      SELECT user_id, event_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def j2_latest_row_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return latest_row_per_key(
        ev, keys=["user_id"], ts_col="ts", tiebreakers=["event_id"]
    ).select("user_id", "event_id", "event_type", "value")


# ---------------------------------------------------------------------------
# J4-J6 — correlated backfill as window aggregate (transformed.sql:41-54).
# Synthetic missingness (orderkey % 7) so the backfill observably fires.
# ---------------------------------------------------------------------------
@register(
    "j4_backfill_within_group",
    """
    SELECT o_orderkey, o_custkey,
           COALESCE(pr, MAX(pr) OVER (PARTITION BY o_custkey)) AS priority_filled
    FROM (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderpriority END AS pr
      FROM orders
    )
    """,
)
def j4_backfill_within_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.when(F.col("o_orderkey") % 7 == 0, None)
        .otherwise(F.col("o_orderpriority"))
        .alias("pr"),
    )
    return backfill_within_group(
        o, "pr", keys=["o_custkey"], strategy="max", out_col="priority_filled"
    ).select("o_orderkey", "o_custkey", "priority_filled")


# ---------------------------------------------------------------------------
# J7 — disjunctive correlated MIN -> least() of per-partitioning window
# mins (transformed.sql:191-205, SURVEY.md §4.2 item 2).
# ---------------------------------------------------------------------------
@register(
    "j7_disjunctive_min",
    """
    SELECT l_orderkey, l_linenumber,
           LEAST(MIN(l_shipdate) OVER (PARTITION BY l_partkey, l_returnflag),
                 MIN(l_shipdate) OVER (PARTITION BY l_suppkey, l_returnflag),
                 MIN(l_shipdate) OVER (PARTITION BY l_orderkey, l_returnflag)) AS fixed_shipdate
    FROM lineitem
    """,
)
def j7_disjunctive_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return disjunctive_group_min(
        li,
        "l_shipdate",
        partitionings=[
            ("l_partkey", "l_returnflag"),
            ("l_suppkey", "l_returnflag"),
            ("l_orderkey", "l_returnflag"),
        ],
        out_col="fixed_shipdate",
    ).select("l_orderkey", "l_linenumber", "fixed_shipdate")


# ---------------------------------------------------------------------------
# J8 — referential-integrity anti-join (dbt relationships tests,
# datamarts.yaml:9-70).
# ---------------------------------------------------------------------------
@register(
    "j8_anti_join",
    """
    SELECT o.o_orderkey, o.o_custkey
    FROM orders o
    WHERE NOT EXISTS (
      SELECT 1 FROM customer c
      WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 5000
    )
    """,
)
def j8_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    rich = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000)
    # filtered customer grows with sf — let AQE choose the anti-join build side
    return o.join(
        rich, o.o_custkey == rich.c_custkey, "left_anti"
    ).select("o_orderkey", "o_custkey")


# ---------------------------------------------------------------------------
# A2 — DISTINCT projection (authors.sql:3-11 / sources.sql:2-9).
# ---------------------------------------------------------------------------
@register(
    "a2_distinct_projection",
    "SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
)
def a2_distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment").distinct()


# ---------------------------------------------------------------------------
# A3 — DISTINCT ON with deterministic ordering (articles.sql:7-19 rewrite).
# ---------------------------------------------------------------------------
@register(
    "a3_distinct_on",
    """
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def a3_distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return distinct_on(
        o, keys=["o_custkey"], order_by=[F.col("o_orderdate").asc(), F.col("o_orderkey").asc()]
    ).select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")


# ---------------------------------------------------------------------------
# U1 — union-all of per-source extracts (newsairflowtasks.py:44-52).
# ---------------------------------------------------------------------------
@register(
    "u1_union_by_name",
    """
    SELECT o_orderpriority, COUNT(*) AS n FROM (
      SELECT o_orderkey, o_orderpriority FROM orders WHERE o_totalprice > 400000
      UNION ALL
      SELECT o_orderkey, o_orderpriority FROM orders
      WHERE o_orderdate >= TIMESTAMP '2001-01-01'
    ) GROUP BY o_orderpriority
    """,
)
def u1_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 400000).select("o_orderkey", "o_orderpriority")
    recent = o.filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    ).select("o_orderkey", "o_orderpriority")
    return big.unionByName(recent).groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )


# ---------------------------------------------------------------------------
# U2 — order-preserving dedup (utils.py:72 ``dict.fromkeys`` rewrite).
# ---------------------------------------------------------------------------
@register(
    "u2_first_occurrence_dedup",
    """
    SELECT user_id, event_type, event_id, ts FROM (
      SELECT user_id, event_type, event_id, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY event_id ASC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def u2_first_occurrence_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return keep_first_by_order(
        ev, keys=["user_id", "event_type"], pos_col="event_id"
    ).select("user_id", "event_type", "event_id", "ts")


# ---------------------------------------------------------------------------
# F-family — scalar string functions (F1-F7: lower/left/punct-strip/trim/
# split_part/length; transformed.sql:73-105, 214-215).
# ---------------------------------------------------------------------------
@register(
    "f_scalar_string",
    rf"""
    SELECT doc_id,
           split_part(text, ' ', 1) AS first_word,
           substr(lower(text), 1, 50) AS head50,
           length(regexp_replace(text, '{PUNCT_CLASS}', '', 'g')) AS nopunct_len,
           trim(substr(text, 1, 30)) AS trimmed_head,
           length(text) AS n_len
    FROM documents
    """,
)
def f_scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.split_part(F.col("text"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.substring(F.lower("text"), 1, 50).alias("head50"),
        F.length(F.regexp_replace("text", PUNCT_CLASS, "")).alias("nopunct_len"),
        F.trim(F.substring("text", 1, 30)).alias("trimmed_head"),
        F.length("text").alias("n_len"),
    )


# ---------------------------------------------------------------------------
# F9 — dbt_utils surrogate keys, bit-compatible md5 recipe
# (transformed.sql:236-244, SURVEY.md §1.3).
# ---------------------------------------------------------------------------
@register(
    "f9_surrogate_keys",
    """
    SELECT c_custkey,
           md5(concat_ws('-',
               COALESCE(CAST(c_name AS VARCHAR), '_dbt_utils_surrogate_key_null_'),
               COALESCE(CAST(c_nationkey AS VARCHAR), '_dbt_utils_surrogate_key_null_'),
               COALESCE(CAST(c_mktsegment AS VARCHAR), '_dbt_utils_surrogate_key_null_'))) AS customer_sk,
           md5(concat_ws('-',
               COALESCE(CAST(c_name AS VARCHAR), '_dbt_utils_surrogate_key_null_'),
               COALESCE(CAST(NULLIF(c_mktsegment, 'BUILDING') AS VARCHAR),
                        '_dbt_utils_surrogate_key_null_'))) AS nullable_sk
    FROM customer
    """,
)
def f9_surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        surrogate_key("c_name", "c_nationkey", "c_mktsegment").alias("customer_sk"),
        surrogate_key(
            F.col("c_name"), F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
        ).alias("nullable_sk"),
    )


# ---------------------------------------------------------------------------
# F8 + F20 + F22 — JSON extraction of the doubly-encoded payload +
# 'N/A' scrub + cast (stg_sentiment.sql:7-11, sentiment_batch_job_tasks.py:
# 258-292).
# ---------------------------------------------------------------------------
@register(
    "f_json_na_scrub",
    """
    SELECT event_id, k_str,
           CASE WHEN k_str = '69' THEN NULL
                ELSE CAST(k_str AS DOUBLE) END AS k_clean
    FROM (
      SELECT event_id, json_extract_string(props, '$.k') AS k_str
      FROM events
    )
    """,
)
def f_json_na_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return ev.select(
        "event_id",
        k.alias("k_str"),
        F.when(k == "69", None).otherwise(k.cast("double")).alias("k_clean"),
    )


# ---------------------------------------------------------------------------
# F10/F11 — email regex extract + scrub (get_news.py:27, utils.py:123,
# sentiment_batch_job_tasks.py:96-105); F12 truncate-at-marker.
# ---------------------------------------------------------------------------
@register(
    "f_email_extract_scrub",
    rf"""
    SELECT doc_id,
           regexp_extract(synth, '{EMAIL_PATTERN}') AS found_email,
           length(regexp_replace(synth, '{EMAIL_PATTERN}', '', 'g')) AS scrubbed_len,
           split_part(text, 'window', 1) AS before_marker
    FROM (
      SELECT doc_id, text,
             'contact ' || source || '@news.ca re: ' || text AS synth
      FROM documents
    )
    """,
)
def f_email_extract_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    synth = F.concat(F.lit("contact "), F.col("source"), F.lit("@news.ca re: "), F.col("text"))
    return docs.select(
        "doc_id",
        F.regexp_extract(synth, EMAIL_PATTERN, 0).alias("found_email"),
        F.length(F.regexp_replace(synth, EMAIL_PATTERN, "")).alias("scrubbed_len"),
        F.split_part(F.col("text"), F.lit("window"), F.lit(1)).alias("before_marker"),
    )


# ---------------------------------------------------------------------------
# O3 — top-K by aggregate (top-50 words twin; here revenue top-10,
# sentiment_dashboard.py:157,364 shape).
# ---------------------------------------------------------------------------
@register(
    "o3_topk_revenue",
    """
    SELECT o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders GROUP BY o_custkey
    ORDER BY revenue DESC, o_custkey ASC LIMIT 10
    """,
)
def o3_topk_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(_dsum("o_totalprice", 18, 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_custkey").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# TPC-H Q3/Q5 shapes — multi-join aggregates, the bench headliners for
# join planning (broadcast dims, AQE).
# ---------------------------------------------------------------------------
@register(
    "tpch_q3_shipping_priority",
    """
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey ASC LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    one = F.lit("1.00").cast("decimal(3,2)")
    rev = _dec("l_extendedprice") * (one - _dec("l_discount", 4, 2))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        # customer grows with sf — AQE decides broadcast vs shuffle join
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@register(
    "tpch_q5_regional_volume",
    """
    SELECT n.n_name AS nation_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
)
def tpch_q5_regional_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    one = F.lit("1.00").cast("decimal(3,2)")
    rev = _dec("l_extendedprice") * (one - _dec("l_discount", 4, 2))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        # supplier grows with sf — AQE decides broadcast vs shuffle join
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(n.n_name.alias("nation_name"))
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Beyond the reference's surface: grouped-analytics completeness the
# engine offers (rollup/grouping-sets, pivot, exact percentiles) — all
# shuffle-once shapes with map-side partials.
# ---------------------------------------------------------------------------
@register(
    "a_rollup_counts",
    """
    SELECT o_orderpriority, o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
    """,
)
def a_rollup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(priority, status) — subtotals + grand total in one pass."""
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        _dsum("o_totalprice", 18, 2).alias("revenue"),
    )


@register(
    "a_pivot_status_counts",
    """
    SELECT o_orderpriority,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS status_f,
           COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS status_o,
           COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS status_p
    FROM orders GROUP BY o_orderpriority
    """,
)
def a_pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot on an explicit value list (no value-discovery scan)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("status_f"),
            F.coalesce("O", F.lit(0)).alias("status_o"),
            F.coalesce("P", F.lit(0)).alias("status_p"),
        )
    )


@register(
    "a_exact_percentiles",
    """
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90
    FROM orders GROUP BY o_orderpriority
    """,
)
def a_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles (Spark `percentile` ==
    DuckDB `quantile_cont`); at 100 TB swap for approx_percentile.

    INVARIANT — interpolated percentile is output-only: never feed it
    into a COMPARISON (a_winsorize's clamp bounds flipped by 1 ulp on
    content-fresh data in round 5 and had to be re-specced to discrete
    rank bounds). Here both percentiles are only SELECTed; the
    ROUND(,4) + 10-sig-digit canonicalization absorbs the ulp."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
    )


@register(
    "a_window_suite",
    """
    SELECT o_custkey, o_orderkey,
           lag(o_orderdate) OVER w AS prev_order_date,
           lead(o_totalprice) OVER w AS next_total,
           ROW_NUMBER() OVER w AS rn,
           NTILE(4) OVER w AS quartile,
           ROUND(cume_dist() OVER w, 6) AS cd
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
    doc="window-function breadth: lag/lead/row_number/ntile/cume_dist, one shuffle",
)
def a_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All five window shapes share ONE window spec -> one hash
    exchange on o_custkey; o_orderkey (unique) makes the in-partition
    order total, so every function is deterministic cross-engine."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderdate").over(w).alias("prev_order_date"),
        F.lead("o_totalprice").over(w).alias("next_total"),
        F.row_number().over(w).alias("rn"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@register(
    "u_intersect_except",
    """
    SELECT o_custkey AS custkey
    FROM orders WHERE year(o_orderdate) = 1995
    INTERSECT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
    doc="set-op breadth: INTERSECT + EXCEPT (distinct semantics both engines)",
)
def u_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers ordering in both 1995 and 1996, minus any with a
    pending order. Spark plans set ops as aggregated joins - the
    custkey exchanges all co-partition."""
    o = load_table(spark, sf_dir, "orders")
    y95 = o.filter(F.year("o_orderdate") == 1995).select(
        F.col("o_custkey").alias("custkey")
    )
    y96 = o.filter(F.year("o_orderdate") == 1996).select(
        F.col("o_custkey").alias("custkey")
    )
    pend = o.filter(F.col("o_orderstatus") == "P").select(
        F.col("o_custkey").alias("custkey")
    )
    return y95.intersect(y96).exceptAll(pend.distinct())


@register(
    "a_time_rollup",
    """
    SELECT event_type,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
           CAST(date_trunc('month', ts) AS TIMESTAMP) AS m,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY GROUPING SETS ((event_type, CAST(date_trunc('day', ts) AS TIMESTAMP)),
                            (event_type, CAST(date_trunc('month', ts) AS TIMESTAMP)),
                            (event_type))
    """,
    doc="hypertable-style multi-granularity rollup: day + month + total per event_type in one pass",
)
def a_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate shape: one scan feeds day-level,
    month-level, and per-type totals via GROUPING SETS (partial
    aggregation map-side for every set)."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("_events_rollup")
    return spark.sql(
        """
        SELECT event_type,
               date_trunc('day', ts) AS d,
               date_trunc('month', ts) AS m,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        FROM _events_rollup
        GROUP BY GROUPING SETS ((event_type, date_trunc('day', ts)),
                                (event_type, date_trunc('month', ts)),
                                (event_type))
        """
    )


@register(
    "tpch_q6_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 forecast-revenue: fully pushed scan-filter-agg, no shuffle of data rows",
)
def tpch_q6_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four predicates push to the parquet scan; the aggregate is a
    map-side partial + single-row final — the cheapest possible shape
    at 100 TB (scan bandwidth bound, ~zero shuffle bytes)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount", 4, 2))
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "tpch_q10_returned_items",
    """
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
    doc="TPC-H Q10 returned-item report: 3-way join + group + deterministic top-20",
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date filter prunes orders before the join; nation is a broadcast
    dim; customer<->orders<->lineitem resolve via AQE (shuffle join at
    scale, broadcast at small sf — no pinned hints on scaling tables).
    c_custkey breaks revenue ties so the LIMIT is total-ordered."""
    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    na = load_table(spark, sf_dir, "nation")
    one = F.lit("1.00").cast("decimal(3,2)")
    rev = F.sum(_dec("l_extendedprice") * (one - _dec("l_discount", 4, 2)))
    return (
        cu.join(o, cu.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(rev.cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "j_semi_exists",
    """
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 450000)
    """,
    doc="EXISTS correlated subquery as a left-semi join (no row duplication)",
)
def j_semi_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: probe side streams, no fan-out however many
    qualifying orders a customer has — the distributed EXISTS. The
    totalprice filter lands on the orders scan before the join."""
    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return cu.join(o, cu.c_custkey == o.o_custkey, "leftsemi").select(
        "c_custkey", "c_mktsegment"
    )


@register(
    "a_conditional_agg",
    """
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
           COUNT(*) AS n_total,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                  FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS finished_value
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="conditional aggregation (TPC-H Q12 shape): FILTER clause vs count/sum-of-CASE",
)
def a_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four aggregates compute in ONE pass / one shuffle —
    conditional masks instead of per-condition self-joins (the
    distributed rewrite of 'N queries over the same table')."""
    o = load_table(spark, sf_dir, "orders")
    fin = F.col("o_orderstatus") == "F"
    return o.groupBy("o_orderpriority").agg(
        F.count(F.when(fin, 1)).alias("n_finished"),
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(fin, _dec("o_totalprice"))).cast("double").alias("finished_value"),
    )


@register(
    "f_fuzzy_levenshtein",
    """
    SELECT a.n_name AS name_a, b.n_name AS name_b,
           levenshtein(a.n_name, b.n_name) AS dist
    FROM nation a JOIN nation b ON a.n_name < b.n_name
    WHERE levenshtein(a.n_name, b.n_name) <= 6
    """,
    doc="fuzzy string matching: edit-distance theta-join over a broadcast dim",
)
def f_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance matching is quadratic by nature - only ever run it
    on small dims (or LSH-blocked candidates); here nation x nation via
    broadcast nested loop, never a shuffled cartesian."""
    na = load_table(spark, sf_dir, "nation")
    a = na.select(F.col("n_name").alias("name_a"))
    b = na.select(F.col("n_name").alias("name_b"))
    return (
        a.join(F.broadcast(b), F.col("name_a") < F.col("name_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= 6)
    )


@register(
    "a_rolling_time_range",
    """
    SELECT event_id, user_id, ts,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS sum_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    doc="rolling 1-hour RANGE window per user: time-interval frame, peer-safe on duplicate ts",
)
def a_rolling_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over integer epoch-micros: duplicate timestamps are
    peers and get identical frames in both engines, so no tiebreaker is
    needed (unlike ROWS frames). One hash exchange on user_id."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.sum(_dec("value")).over(w).cast("double").alias("sum_1h"),
    )


@register(
    "a_corr_stats",
    """
    SELECT l_returnflag,
           ROUND(CAST((n * sxy - sx * sy) AS DOUBLE)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS r,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)), 2) AS cov
    FROM (
      SELECT l_returnflag, COUNT(*) AS n,
             SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sx,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS sy,
             SUM(CAST(l_quantity AS DECIMAL(12,2))
                 * CAST(l_extendedprice AS DECIMAL(12,2))) AS sxy,
             SUM(CAST(l_quantity AS DECIMAL(12,2))
                 * CAST(l_quantity AS DECIMAL(12,2))) AS sxx,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * CAST(l_extendedprice AS DECIMAL(12,2))) AS syy
      FROM lineitem GROUP BY l_returnflag
    )
    """,
    doc="correlation + sample covariance via exact decimal moments (engine-portable corr)",
)
def a_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson r and covar_samp from exact DECIMAL moment sums (same
    rule as q6_mean_std): five partial-aggregated sums in one shuffle,
    then one deterministic double expression — native corr() is
    summation-order-dependent across engines; this is not."""
    li = load_table(spark, sf_dir, "lineitem")
    qd = _dec("l_quantity")
    pd_ = _dec("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(qd).alias("sx"),
        F.sum(pd_).alias("sy"),
        F.sum(qd * pd_).alias("sxy"),
        F.sum(qd * qd).alias("sxx"),
        F.sum(pd_ * pd_).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    r = (n * sxy - sx * sy).cast("double") / (
        F.sqrt((n * sxx - sx * sx).cast("double"))
        * F.sqrt((n * syy - sy * sy).cast("double"))
    )
    cov = (n * sxy - sx * sy).cast("double") / (
        n.cast("double") * (n - F.lit(1))
    )
    return m.select(
        "l_returnflag",
        F.round(r, 6).alias("r"),
        F.round(cov, 2).alias("cov"),
    )


@register(
    "a_unpivot_metrics",
    """
    WITH m AS (
      SELECT o_orderpriority,
             CAST(COUNT(*) AS DOUBLE) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
             MAX(o_totalprice) AS max_value
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS value FROM m
    UNION ALL
    SELECT o_orderpriority, 'total_value' AS metric, total_value AS value FROM m
    UNION ALL
    SELECT o_orderpriority, 'max_value' AS metric, max_value AS value FROM m
    """,
    doc="wide->long unpivot of per-group metrics (Spark unpivot/stack vs UNION ALL)",
)
def a_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One aggregation pass then an in-place unpivot — the long form
    costs no extra shuffle (unpivot is a local generate), vs the
    oracle's 3x UNION re-reads."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        F.sum(_dec("o_totalprice")).cast("double").alias("total_value"),
        F.max("o_totalprice").alias("max_value"),
    )
    return m.unpivot(
        ["o_orderpriority"],
        ["n_orders", "total_value", "max_value"],
        "metric",
        "value",
    )


@register(
    "a_array_agg_ops",
    """
    SELECT c_nationkey,
           CAST(len(ks) AS INTEGER) AS n,
           ks[1] AS first_key,
           ks[-1] AS last_key,
           array_to_string(ks[1:5], ',') AS first5
    FROM (SELECT c_nationkey, list_sort(list(c_custkey)) AS ks
          FROM customer GROUP BY c_nationkey)
    """,
    doc="array aggregation + element/slice ops: sorted collect_list per group",
)
def a_array_agg_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list is safe ONLY because the per-group cardinality is
    bounded (customers per nation); sort_array makes the aggregation
    order-insensitive, which is what makes it deterministic under
    distributed, nondeterministically-ordered partials.

    `first5` is rendered as a comma-joined string rather than a raw
    ARRAY column: result frames must stay scalar-typed so downstream
    canonicalizers (pandas sort/hash) never see unhashable lists.
    """
    cu = load_table(spark, sf_dir, "customer")
    g = cu.groupBy("c_nationkey").agg(
        F.sort_array(F.collect_list("c_custkey")).alias("ks")
    )
    return g.select(
        "c_nationkey",
        F.size("ks").alias("n"),
        F.element_at("ks", 1).alias("first_key"),
        F.element_at("ks", -1).alias("last_key"),
        F.array_join(
            F.transform(F.slice("ks", 1, 5), lambda x: x.cast("string")), ","
        ).alias("first5"),
    )


@register(
    "f_datetime_suite",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS y,
           CAST(quarter(o_orderdate) AS INTEGER) AS q,
           CAST(month(o_orderdate) AS INTEGER) AS m,
           CAST(day(o_orderdate) AS INTEGER) AS d,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
           CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
           CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS plus30,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS INTEGER)
             AS days_since_epoch_start
    FROM orders
    WHERE o_orderkey % 10 = 0
    """,
    doc="datetime scalar breadth: field extraction, interval add, last_day, datediff",
)
def f_datetime_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All pure column expressions — whole-stage-codegen'd, no Python.
    DuckDB numbers Sunday 0 where Spark numbers it 1; the oracle
    shifts (+1) so both emit Spark's convention."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.quarter("o_orderdate").alias("q"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.dayofyear("o_orderdate").alias("doy"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("plus30"),
        F.last_day("o_orderdate").alias("month_end"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
    )


@register(
    "p_scalar_subquery",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 0.9 * (SELECT MAX(o_totalprice) FROM orders)
    """,
    doc="uncorrelated scalar subquery: one-row broadcast threshold, no row-vs-row recompute",
)
def p_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalyst evaluates the scalar subquery once and broadcasts the
    threshold into the scan filter — the distributed equivalent of
    'compute a constant, then filter', never a join. MAX (not AVG) so
    the threshold is bit-identical in both engines."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_orders_ssq")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM _orders_ssq
        WHERE o_totalprice > 0.9 * (SELECT MAX(o_totalprice) FROM _orders_ssq)
        """
    )


@register(
    "tpch_q19_disjunctive_join",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 10 AND l_quantity <= 35)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 20 AND l_quantity <= 50)
    """,
    doc="TPC-H Q19 shape: equi-join carries, OR-of-ANDs evaluates post-join",
)
def tpch_q19_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The equi-key (partkey) carries the join; the disjunction cannot
    push into either scan whole, but its single-table residuals
    (p_brand IN ..., l_quantity bounds) do — Catalyst extracts them.
    Never express this as a cartesian with an OR predicate."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(p, p.p_partkey == li.l_partkey)
    clause = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(10, 35))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(20, 50))
    )
    one = F.lit("1.00").cast("decimal(3,2)")
    return j.filter(clause).agg(
        F.sum(_dec("l_extendedprice") * (one - _dec("l_discount", 4, 2)))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "merge_upsert_customers",
    """
    WITH src AS (
      SELECT c_custkey, c_name, c_nationkey, c_acctbal + 1000 AS c_acctbal,
             c_mktsegment
      FROM customer WHERE c_custkey % 7 = 0
      UNION ALL
      SELECT c_custkey + 1000000, 'NEW-' || c_name, c_nationkey, c_acctbal,
             'NEWSEG'
      FROM customer WHERE c_custkey % 97 = 0
    )
    SELECT COALESCE(s.c_custkey, t.c_custkey) AS c_custkey,
           COALESCE(s.c_name, t.c_name) AS c_name,
           COALESCE(s.c_nationkey, t.c_nationkey) AS c_nationkey,
           COALESCE(s.c_acctbal, t.c_acctbal) AS c_acctbal,
           COALESCE(s.c_mktsegment, t.c_mktsegment) AS c_mktsegment
    FROM customer t FULL OUTER JOIN src s ON t.c_custkey = s.c_custkey
    """,
    doc="MERGE upsert (update-matched + insert-unmatched) as full-outer join + coalesce",
)
def merge_upsert_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic delta built from the target itself: every 7th
    customer gets an acctbal update, every 97th spawns an insert with
    a shifted key. One full-outer shuffle join; AQE broadcasts the
    delta side when it is small (the production norm)."""
    from ..operators.merge import merge_upsert

    cu = load_table(spark, sf_dir, "customer")
    updates = cu.filter(F.col("c_custkey") % 7 == 0).withColumn(
        "c_acctbal", F.col("c_acctbal") + 1000
    )
    inserts = cu.filter(F.col("c_custkey") % 97 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.concat(F.lit("NEW-"), F.col("c_name")).alias("c_name"),
        "c_nationkey",
        "c_acctbal",
        F.lit("NEWSEG").alias("c_mktsegment"),
    )
    return merge_upsert(cu, updates.unionByName(inserts), ["c_custkey"])


@register(
    "a_rank_functions",
    """
    SELECT l_orderkey, l_linenumber, l_quantity,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ROUND(percent_rank() OVER w, 6) AS pr
    FROM lineitem
    WHERE l_orderkey % 50 = 0
    WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_quantity ASC)
    """,
    doc="rank/dense_rank/percent_rank: tie-stable by definition (peers share ranks)",
)
def a_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank-family functions are deterministic under ties without a
    tiebreaker (peers get equal values) — unlike row_number, which is
    why a_window_suite needs its unique-key ordering and this doesn't."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    w = Window.partitionBy("l_orderkey").orderBy(F.col("l_quantity").asc())
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
    )


@register(
    "f_string_suite2",
    """
    SELECT c_custkey,
           lpad(c_name, 30, '*') AS padded,
           repeat(c_mktsegment, 2) AS doubled,
           reverse(c_name) AS rev,
           CAST(ascii(substr(c_name, 1, 1)) AS INTEGER) AS first_code,
           concat_ws('|', c_mktsegment, c_name) AS joined,
           substr(c_name, 1, 5) AS l5,
           substr(c_name, length(c_name) - 4, 5) AS r5
    FROM customer WHERE c_custkey % 5 = 0
    """,
    doc="string scalar breadth 2: pad/repeat/reverse/ascii/concat_ws/affixes",
)
def f_string_suite2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 5 == 0)
    return li.select(
        "c_custkey",
        F.lpad("c_name", 30, "*").alias("padded"),
        F.repeat("c_mktsegment", 2).alias("doubled"),
        F.reverse("c_name").alias("rev"),
        F.ascii(F.substring("c_name", 1, 1)).alias("first_code"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("joined"),
        F.substring("c_name", 1, 5).alias("l5"),
        F.substring("c_name", -5, 5).alias("r5"),
    )


@register(
    "f_bitwise_ops",
    """
    SELECT o_orderkey,
           o_orderkey & 255 AS band,
           o_orderkey | 4096 AS bor,
           xor(o_orderkey, 255) AS bxor,
           o_orderkey << 2 AS shl,
           o_orderkey >> 3 AS shr,
           CAST(bit_count(o_orderkey) AS INTEGER) AS bits
    FROM orders WHERE o_orderkey % 20 = 0
    """,
    doc="bitwise scalar breadth: and/or/xor/shifts/popcount (hash-bucketing primitives)",
)
def f_bitwise_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The primitives every hash-partitioner/sketch builds on —
    all JVM codegen, zero shuffle."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 20 == 0)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("band"),
        k.bitwiseOR(F.lit(4096)).alias("bor"),
        k.bitwiseXOR(F.lit(255)).alias("bxor"),
        F.shiftleft(k, 2).alias("shl"),
        F.shiftright(k, 3).alias("shr"),
        F.bit_count(k).alias("bits"),
    )


@register(
    "events_gap_islands",
    """
    WITH days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
      FROM events
    ),
    g AS (
      SELECT user_id, d,
             d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d ASC)
                      AS INTEGER) AS grp
      FROM days
    )
    SELECT user_id, MIN(d) AS streak_start, MAX(d) AS streak_end,
           COUNT(*) AS streak_days
    FROM g GROUP BY user_id, grp
    """,
    doc="gaps-and-islands: consecutive-day activity streaks via date-minus-row_number",
)
def events_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic islands trick: within a user, consecutive dates
    share (date - row_number) — turning streak detection into a plain
    groupBy. One exchange for the window, one for the final agg, both
    keyed on user_id so AQE can reuse the partitioning. The distinct-
    days step bounds window-partition size at days-per-user, not
    events-per-user."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy(F.col("d").asc())
    g = days.withColumn("grp", F.date_sub(F.col("d"), F.row_number().over(w)))
    return (
        g.groupBy("user_id", "grp")
        .agg(
            F.min("d").alias("streak_start"),
            F.max("d").alias("streak_end"),
            F.count(F.lit(1)).alias("streak_days"),
        )
        .drop("grp")
    )


@register(
    "a_cube_counts",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_prio
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE with GROUPING() markers: all 4 margins in one pass",
)
def a_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE expands to grouping sets executed in ONE aggregation pass
    (Expand + partial agg), not 4 scans; GROUPING() disambiguates real
    NULL keys from margin rows."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_prio"),
    )


@register(
    "u_union_missing_cols",
    """
    SELECT o_orderkey AS k, o_totalprice AS price, CAST(NULL AS VARCHAR) AS segment
    FROM orders WHERE o_orderkey % 100 = 0
    UNION ALL
    SELECT c_custkey AS k, CAST(NULL AS DOUBLE) AS price, c_mktsegment AS segment
    FROM customer WHERE c_custkey % 50 = 0
    """,
    doc="schema-evolution union: unionByName(allowMissingColumns) null-fills absent columns",
)
def u_union_missing_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The schema-drift union every long-lived ingestion hits: new
    columns appear in new data, old files lack them. unionByName with
    allowMissingColumns aligns by NAME (never position) and null-fills
    — positional unionAll would silently mismatch columns."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    cu = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 50 == 0)
    left = o.select(F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("price"))
    right = cu.select(
        F.col("c_custkey").alias("k"), F.col("c_mktsegment").alias("segment")
    )
    return left.unionByName(right, allowMissingColumns=True)


@register(
    "tpch_q4_priority_check",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: EXISTS semi-join feeding an aggregate",
)
def tpch_q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join (never inner + distinct — that double-counts and
    shuffles wider) then the priority rollup; the date filter pushes
    to the orders scan, the quantity filter to the lineitem scan."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "leftsemi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "tpch_q13_order_distribution",
    """
    WITH co AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON o_custkey = c_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM co GROUP BY c_count
    """,
    doc="TPC-H Q13: two-level aggregation (per-customer count, then distribution of counts)",
)
def tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join keeps zero-order customers (COUNT of a nullable col
    skips their null), then a second tiny aggregation over the
    distribution — the canonical histogram-of-group-sizes shape. Both
    exchanges are on low-cardinality keys; the second input is already
    one row per customer."""
    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    co = (
        cu.join(o, cu.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return co.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "tpch_q18_large_orders",
    """
    SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > CAST(150 AS DECIMAL(12,2))
    )
    GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
    doc="TPC-H Q18: IN-subquery with HAVING on an exact-decimal aggregate (large-volume orders)",
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HAVING subquery reduces to a semi-join on qualifying order
    keys; the decimal threshold compare is exact on both engines (a
    double HAVING could flip orders sitting on the boundary). The big
    lineitem agg happens once, keyed the same as the join."""
    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("q"))
        .filter(F.col("q") > F.lit(150).cast("decimal(12,2)"))
        .select("l_orderkey")
    )
    return (
        cu.join(o, cu.c_custkey == o.o_custkey)
        .join(li.withColumnRenamed("l_orderkey", "lk"), F.col("lk") == o.o_orderkey)
        .join(big, big.l_orderkey == o.o_orderkey, "leftsemi")
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("total_qty"))
    )


@register(
    "a_multi_distinct",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="multiple COUNT(DISTINCT) over different columns: one Expand pass, not N scans",
)
def a_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalyst rewrites N distinct aggregates into a single Expand
    (one row per distinct-column per input row) + two-level agg — one
    scan, not one per distinct column. At extreme cardinality swap in
    the KMV sketch (sketch_kmv_distinct) for a bounded-memory answer."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "a_window_value_fns",
    """
    SELECT o_custkey, o_orderkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price,
           nth_value(o_totalprice, 3) OVER w AS third_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
    doc="first_value/last_value/nth_value: running vs full frames, one exchange",
)
def a_window_value_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/nth use the default running frame (null until the nth row
    arrives); last_value needs the explicit full frame — with the
    default frame it degenerates to 'current row' in BOTH engines, a
    classic silent bug. All three share one hash exchange."""
    o = load_table(spark, sf_dir, "orders")
    order = [F.col("o_orderdate").asc(), F.col("o_orderkey").asc()]
    run = Window.partitionBy("o_custkey").orderBy(*order)
    full = run.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(run).alias("first_price"),
        F.last("o_totalprice").over(full).alias("last_price"),
        F.nth_value("o_totalprice", 3).over(run).alias("third_price"),
    )


@register(
    "a_locf_fill",
    """
    SELECT event_id, user_id, ts,
           last_value(v IGNORE NULLS) OVER
             (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
              ROWS UNBOUNDED PRECEDING) AS v_filled
    FROM (SELECT event_id, user_id, ts,
                 CASE WHEN value < 5 THEN NULL ELSE value END AS v
          FROM events)
    """,
    doc="LOCF forward-fill: last_value IGNORE NULLS running frame (timeseries gap fill)",
)
def a_locf_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward — the streaming-friendly gap
    fill (running frame: O(1) state, never looks ahead). Nulls are
    synthesized from small values so the fill path is actually
    exercised."""
    ev = load_table(spark, sf_dir, "events")
    v = F.when(F.col("value") < 5, F.lit(None)).otherwise(F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.last(v, ignorenulls=True).over(w).alias("v_filled"),
    )


@register(
    "a_string_agg",
    """
    SELECT c_nationkey, string_agg(c_name, ',' ORDER BY c_name ASC) AS names
    FROM customer WHERE c_custkey % 40 = 0
    GROUP BY c_nationkey
    """,
    doc="ordered string aggregation (listagg): sort-then-join for deterministic output",
)
def a_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list order is nondeterministic under distributed
    partials — ALWAYS sort before joining (the ORDER BY inside the
    oracle's string_agg is the same contract). Bounded groups only."""
    cu = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 40 == 0)
    return cu.groupBy("c_nationkey").agg(
        F.array_join(F.array_sort(F.collect_list("c_name")), ",").alias("names")
    )


@register(
    "f_regex_suite",
    r"""
    SELECT c_custkey,
           regexp_replace(c_name, '^(\w+)#(\d+)$', '\2#\1') AS swapped,
           regexp_extract(c_name, '(\d+)', 1) AS digits,
           regexp_matches(c_name, '\d{3}') AS has_3digits
    FROM customer WHERE c_custkey % 15 = 0
    """,
    doc="regex breadth: capture-group backrefs, group extract, boolean match",
)
def f_regex_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same regexes, engine-native backref syntax ($n Java / \\n RE2)
    — the portable subset. All codegen'd, no Python."""
    cu = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 15 == 0)
    return cu.select(
        "c_custkey",
        F.regexp_replace("c_name", r"^(\w+)#(\d+)$", r"$2#$1").alias("swapped"),
        F.regexp_extract("c_name", r"(\d+)", 1).alias("digits"),
        F.col("c_name").rlike(r"\d{3}").alias("has_3digits"),
    )


@register(
    "f_math_suite",
    """
    SELECT o_orderkey,
           ROUND(sqrt(o_totalprice), 6) AS sq,
           ROUND(ln(o_totalprice), 6) AS lg,
           ROUND(log10(o_totalprice), 6) AS l10,
           ROUND(exp(o_totalprice / 100000), 6) AS ex,
           ROUND(pow(o_totalprice, 0.5), 6) AS pw,
           abs(o_totalprice * -1) AS ab,
           CAST(sign(o_totalprice - 250000) AS DOUBLE) AS sg,
           mod(o_orderkey, 97) AS md,
           CAST(ceil(o_totalprice) AS BIGINT) AS ce,
           CAST(floor(o_totalprice) AS BIGINT) AS fl
    FROM orders WHERE o_orderkey % 25 = 0
    """,
    doc="math scalar breadth: libm functions rounded to 6dp (ulp-portable), exact int ops raw",
)
def f_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sqrt is IEEE-exact; ln/log10/exp/pow may differ by an ulp
    between JVM and C libm, so they round to 6dp. ceil/floor/mod/abs
    are exact and compare raw."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 25 == 0)
    tp = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.round(F.sqrt(tp), 6).alias("sq"),
        F.round(F.log(tp), 6).alias("lg"),
        F.round(F.log10(tp), 6).alias("l10"),
        F.round(F.exp(tp / 100000), 6).alias("ex"),
        F.round(F.pow(tp, 0.5), 6).alias("pw"),
        F.abs(tp * -1).alias("ab"),
        F.signum(tp - 250000).alias("sg"),
        (F.col("o_orderkey") % 97).alias("md"),
        F.ceil(tp).alias("ce"),
        F.floor(tp).alias("fl"),
    )


@register(
    "events_funnel_stages",
    """
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN s1 ON s1.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts >= s1.t_view
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN s2 ON s2.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= s2.t_click
      GROUP BY e.user_id
    )
    SELECT s1.user_id, s1.t_view, s2.t_click, s3.t_purchase,
           s2.user_id IS NOT NULL AS reached_click,
           s3.user_id IS NOT NULL AS reached_purchase
    FROM s1
    LEFT JOIN s2 ON s2.user_id = s1.user_id
    LEFT JOIN s3 ON s3.user_id = s1.user_id
    """,
    doc="3-stage ordered funnel (view -> click -> purchase): per-stage first-times + reach flags",
)
def events_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis: each stage's first-time must follow the
    previous stage's (MIN is deterministic — no tiebreaks needed).
    Every aggregation and join keys on user_id, so AQE reuses one
    partitioning across all three stages; per-user state is O(stages),
    never the user's event history."""
    ev = load_table(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            F.col("t_click").isNotNull().alias("reached_click"),
            F.col("t_purchase").isNotNull().alias("reached_purchase"),
        )
    )


@register(
    "f_conditional_suite",
    """
    SELECT o_orderkey,
           greatest(o_totalprice, 250000.0) AS hi,
           least(o_totalprice, 250000.0) AS lo,
           nullif(o_orderstatus, 'O') AS status_or_null,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_label,
           CASE WHEN o_totalprice > 400000 THEN 'XL'
                WHEN o_totalprice > 200000 THEN 'L'
                ELSE 'S' END AS size_class
    FROM orders WHERE o_orderkey % 30 = 0
    """,
    doc="conditional scalar breadth: greatest/least/nullif/coalesce/searched CASE",
)
def f_conditional_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 30 == 0)
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return o.select(
        "o_orderkey",
        F.greatest(F.col("o_totalprice"), F.lit(250000.0)).alias("hi"),
        F.least(F.col("o_totalprice"), F.lit(250000.0)).alias("lo"),
        status_or_null.alias("status_or_null"),
        F.coalesce(status_or_null, F.lit("OPEN")).alias("status_label"),
        F.when(F.col("o_totalprice") > 400000, "XL")
        .when(F.col("o_totalprice") > 200000, "L")
        .otherwise("S")
        .alias("size_class"),
    )


@register(
    "a_sliding_rows_avg",
    """
    SELECT o_custkey, o_orderkey,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE)
                 / COUNT(*) OVER w, 4) AS avg_last3
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    doc="sliding ROWS-frame moving average over the last 3 orders (exact decimal sum / count)",
)
def a_sliding_rows_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS frames need the total-order tiebreaker (o_orderkey) —
    unlike RANGE frames, peers are NOT equivalent, so an ambiguous sort
    silently reshuffles which rows share a frame. Decimal-sum/count
    instead of native avg keeps the division engine-exact."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(-2, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum(_dec("o_totalprice")).over(w).cast("double")
            / F.count(F.lit(1)).over(w),
            4,
        ).alias("avg_last3"),
    )


@register(
    "a_null_ordering",
    """
    SELECT event_id, user_id, v,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY v ASC NULLS LAST, event_id ASC) AS rn
    FROM (SELECT event_id, user_id,
                 CASE WHEN value < 5 THEN NULL ELSE value END AS v
          FROM events)
    WHERE user_id % 10 = 0
    """,
    doc="explicit null ordering: Spark defaults NULLS FIRST asc, DuckDB NULLS LAST - always say which",
)
def a_null_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engines disagree on DEFAULT null placement in ASC sorts (Spark:
    first, DuckDB/Postgres: last) — any window ordering over a nullable
    key must spell it out or row numbering silently diverges."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 0)
    v = F.when(F.col("value") < 5, F.lit(None)).otherwise(F.col("value"))
    w = Window.partitionBy("user_id").orderBy(
        F.col("v").asc_nulls_last(), F.col("event_id").asc()
    )
    return ev.select("event_id", "user_id", v.alias("v")).withColumn(
        "rn", F.row_number().over(w)
    )
