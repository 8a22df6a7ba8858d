"""Remaining dashboard/prep query shapes (SURVEY.md §3.3 Q2/Q5, §2.2
P9, §2.1 S1) with DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.cleaning import clean_article_content
from ..sources.registry import load_table
from .registry import register

# Q2 content pull: the reference filters with case-insensitive LIKEs
# and runs the newline/"Trending Now"/email/url scrub chain
# (sentiment_dashboard.py:98-130 ≡ sentiment_batch_job_tasks.py:82-106).
# The synthetic content plants every marker the scrub must remove.
_Q2_SYNTH = """
  SELECT doc_id, text,
         text
         || CASE WHEN doc_id % 7 = 0 THEN ' trending now promo stuff' ELSE '' END
         || CASE WHEN doc_id % 5 = 0 THEN ' write to tips@news.ca today' ELSE '' END
         || CASE WHEN doc_id % 4 = 0 THEN ' via www.newsy.ca wire' ELSE '' END
         || CASE WHEN doc_id % 9 = 0 THEN chr(10) || 'line two' ELSE '' END
           AS content
  FROM documents
"""


@register(
    "q2_content_pull_scrub",
    rf"""
    WITH synth AS ({_Q2_SYNTH})
    SELECT doc_id AS id,
           split_part(
             split_part(regexp_replace(content, chr(10), '', 'g'),
                        'trending now', 1),
             'Trending Now', 1) AS content_pre,
           length(
             regexp_replace(
               regexp_replace(
                 split_part(
                   split_part(regexp_replace(content, chr(10), '', 'g'),
                              'trending now', 1),
                   'Trending Now', 1),
                 '[\w\.-]+@[\w\-]+\.[a-zA-Z]{{2,6}}', '', 'g'),
               'www\.[a-zA-Z0-9\-]+\.[\w]{{2,6}}', '', 'g')) AS clean_len
    FROM synth
    WHERE (lower(content) LIKE '%spark%' OR lower(content) LIKE '%stream%')
      AND length(content) >= 20
    """,
    doc="dashboard Q2: ilike-OR filter + unified content scrub (F5/F11/F12, P4-P6)",
)
def q2_content_pull_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    content = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 7 == 0, " trending now promo stuff").otherwise(""),
        F.when(F.col("doc_id") % 5 == 0, " write to tips@news.ca today").otherwise(""),
        F.when(F.col("doc_id") % 4 == 0, " via www.newsy.ca wire").otherwise(""),
        F.when(F.col("doc_id") % 9 == 0, F.concat(F.lit("\n"), F.lit("line two"))).otherwise(""),
    )
    synth = docs.select("doc_id", content.alias("content"))
    # content_pre = newline strip + both marker truncations (F5+F12);
    # clean_len measures the full clean_article_content chain (adds F11).
    pre = F.split_part(
        F.split_part(
            F.regexp_replace("content", r"\n", ""),
            F.lit("trending now"),
            F.lit(1),
        ),
        F.lit("Trending Now"),
        F.lit(1),
    )
    return (
        synth.filter(
            (F.lower("content").contains("spark") | F.lower("content").contains("stream"))
            & (F.length("content") >= 20)
        )
        .select(
            F.col("doc_id").alias("id"),
            pre.alias("content_pre"),
            F.length(clean_article_content(F.col("content"))).alias("clean_len"),
        )
    )


@register(
    "q5_mention_counts",
    """
    SELECT 'spark' AS term, COUNT(*) AS n_docs FROM documents
    WHERE lower(text) LIKE '%spark%'
    UNION ALL
    SELECT 'stream', COUNT(*) FROM documents WHERE lower(text) LIKE '%stream%'
    """,
    doc="dashboard Q5 (sentiment_dashboard.py:281-285): per-term mention counts (A5)",
)
def q5_mention_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")

    def count_term(term: str) -> DataFrame:
        return docs.filter(F.lower("text").contains(term)).agg(
            F.lit(term).alias("term"), F.count(F.lit(1)).alias("n_docs")
        )

    return count_term("spark").unionByName(count_term("stream"))


@register(
    "p9_zero_to_null_avg",
    """
    SELECT event_type,
           COUNT(v) AS n_nonnull,
           CAST(SUM(CAST(v AS DECIMAL(12,2))) AS DOUBLE) / COUNT(v) AS avg_nonzero
    FROM (
      SELECT event_type, CASE WHEN value < 1.0 THEN NULL ELSE value END AS v
      FROM events
    ) GROUP BY event_type
    """,
    doc="P9 (sentiment_dashboard.py:62-65): treat ~zero scores as missing, null-skipping mean",
)
def p9_zero_to_null_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = F.when(F.col("value") < 1.0, None).otherwise(F.col("value"))
    return (
        ev.select("event_type", v.alias("v"))
        .groupBy("event_type")
        .agg(
            F.count("v").alias("n_nonnull"),
            (F.sum(F.col("v").cast("decimal(12,2)")).cast("double") / F.count("v")).alias(
                "avg_nonzero"
            ),
        )
    )


@register(
    "s1_rss_feed_scan",
    """
    WITH feed AS (
      SELECT source,
             '<rss><channel>' ||
             string_agg('<item><link>https://' || source || '/art/' ||
                        CAST(doc_id AS VARCHAR) || '</link></item>', ''
                        ORDER BY doc_id) ||
             '</channel></rss>' AS xml
      FROM documents GROUP BY source
    )
    SELECT source, u.link
    FROM feed, unnest(regexp_extract_all(xml, '<link>([^<]+)</link>', 1)) AS u(link)
    """,
    doc="S1 (get_news.py:54-68): RSS feed scan — XML item links via xpath",
)
def s1_rss_feed_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    item = F.concat(
        F.lit("<item><link>https://"),
        F.col("source"),
        F.lit("/art/"),
        F.col("doc_id").cast("string"),
        F.lit("</link></item>"),
    )
    feed = (
        docs.select("source", F.struct("doc_id", item.alias("item")).alias("s"))
        .groupBy("source")
        .agg(
            F.concat(
                F.lit("<rss><channel>"),
                F.concat_ws(
                    "", F.transform(F.array_sort(F.collect_list("s")), lambda x: x["item"])
                ),
                F.lit("</channel></rss>"),
            ).alias("xml")
        )
    )
    return feed.select(
        "source",
        F.explode(F.xpath("xml", F.lit("/rss/channel/item/link/text()"))).alias("link"),
    )


@register(
    "f18_lookback_window",
    """
    SELECT o_orderpriority, COUNT(*) AS n,
           CAST(MIN(o_orderdate) AS DATE) AS first_day
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '2001-08-01' - INTERVAL 60 DAY
    GROUP BY o_orderpriority
    """,
    doc="F18 (sentiment_batch_job_tasks.py:40-41): n-days-back lookback window",
)
def f18_lookback_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    anchor = F.lit("2001-08-01").cast("timestamp")
    return (
        o.filter(F.col("o_orderdate") >= F.date_sub(anchor, 60).cast("timestamp"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_orderdate").cast("date").alias("first_day"),
        )
    )
