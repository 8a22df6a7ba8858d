"""The reference's dbt model DAG as pure DataFrame functions.

Reference models (all in airflow_news/newsdbt/models/):
staging/stg_articles.sql -> ref/transformed.sql -> datamarts/{articles,
authors,sources,article_author_join_table}.sql; staging/stg_sentiment.sql
-> datamarts/sentiment.sql.

Deliberate, documented divergences from the reference (SURVEY.md §7.4):

1. Correlated ``SELECT DISTINCT ... LIMIT 1`` backfills
   (transformed.sql:41-54,112-154) are nondeterministic; we use
   ``MAX(...) OVER (PARTITION BY match-keys)`` masked by the same
   null-rejecting equality conditions. O(n log n) + one shuffle per
   partitioning instead of O(n^2) correlated scans.
2. The disjunctive correlated MIN (transformed.sql:191-205) becomes
   ``least()`` over three per-partitioning window MINs; rows with a
   NULL url/content take their branch from the always-non-null title
   branch via coalesce (NULL keys never match in the reference's
   ``=`` predicates either).
3. ``DISTINCT ON`` + right-join dedup in the articles mart
   (articles.sql:7-58) becomes one row_number window with explicit
   tiebreakers (creation_time DESC, id DESC).
4. ``REPLACE(email, '\\n', '')`` (transformed.sql:105) removes real
   newline characters (the reference's intent), not the two-character
   backslash-n sequence Postgres standard strings would match.
5. Content equality in window partitionings uses md5(content) so the
   shuffle key is 32 bytes, not an arbitrary-length article body —
   required at 100 TB, same equivalence classes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.cleaning import strip_punct
from ..functions.keys import surrogate_key
from ..operators.dedup_window import latest_row_per_key

DEFAULT_RUN_TS = "2025-01-01 00:00:00+00:00"


def stg_articles(raw_news: DataFrame) -> DataFrame:
    """staging/stg_articles.sql:7-23 — cast-and-rename projection (P1)."""
    return raw_news.select(
        F.col("id").cast("long").alias("id"),
        F.col("source_name").cast("string").alias("news_source_name"),
        F.col("source_country").cast("string").alias("news_source_country"),
        F.col("category").cast("string").alias("news_category"),
        F.col("author").cast("string").alias("author"),
        F.col("author_email").cast("string").alias("author_email"),
        F.col("author_url").cast("string").alias("author_url"),
        F.col("title").cast("string").alias("title"),
        F.col("description").cast("string").alias("description"),
        F.col("url").cast("string").alias("url"),
        F.col("publishedat").cast("timestamp").alias("publishedat"),
        F.col("article_content").cast("string").alias("article_content"),
        F.col("bias").cast("string").alias("bias"),
        F.col("ingest_ts").cast("timestamp").alias("creation_time"),
    )


def transformed(
    stg: DataFrame,
    run_ts: str = DEFAULT_RUN_TS,
    excluded_sources: tuple[str, ...] = ("toronto_star", "cbc"),
) -> DataFrame:
    """ref/transformed.sql:1-247 — the reference's core cleaning model.

    Shuffle plan: all seven window partitionings contain ``author`` (or
    ``author_t = trim(author)``), and author -> author_t is a functional
    dependency, so prefixing every window key with ``author_t`` never
    splits a group while making one hash exchange on ``author_t``
    satisfy all of them (HashPartitioning on a subset of the clustering
    keys satisfies ClusteredDistribution). One shuffle + seven
    pipelined sorts instead of seven shuffles. NULL authors all land in
    one partition, but the reference drops them two steps later
    (null-rejecting ``!=``), so the skew is bounded by one source's
    null rate; at 100 TB pre-filter or salt if that rate is high.
    """
    df = stg.withColumn("author_t", F.trim(F.col("author"))).repartition(
        F.col("author_t")
    )

    # BACKFILL_CONTENT (transformed.sql:41-54): null-rejecting match on
    # (author, author_email, title, source, url) — raw author/email.
    w_content = Window.partitionBy(
        "author_t", "author", "author_email", "title", "news_source_name", "url"
    )
    all_keys_nn = (
        F.col("author").isNotNull()
        & F.col("author_email").isNotNull()
        & F.col("url").isNotNull()
    )
    df = df.withColumn(
        "article_content",
        F.coalesce(
            F.col("article_content"),
            F.when(all_keys_nn, F.max("article_content").over(w_content)),
        ),
    )

    # raw_clean_content (transformed.sql:73-77): LOWER(LEFT(strip_punct, 50)).
    df = df.withColumn(
        "article_content_clean",
        F.lower(F.substring(strip_punct(F.col("article_content")), 1, 50)),
    )

    # DROP_URL_AUTHOR (transformed.sql:83-87): != is null-rejecting,
    # so NULL authors drop too — matches Postgres.
    df = df.filter(F.col("author") != "www.facebook.com")

    # CLEANED_AUTHOR / CLEANED_AUTHOR2 (transformed.sql:91-106).
    # (author_t computed upfront to drive the shared partitioning.)
    df = df.withColumn(
        "author_email_c", F.regexp_replace(F.lower("author_email"), r"\n", "")
    )

    # SAME_AUTHOR_URL (transformed.sql:112-154): two-branch backfills on
    # the cleaned author/email.
    w_url_email = Window.partitionBy("author_t", "author_email_c")
    w_by_source = Window.partitionBy("author_t", "news_source_name")
    df = df.withColumn(
        "author_url_f",
        F.when(
            F.col("author_url").isNull() & F.col("author_email_c").isNotNull(),
            F.max("author_url").over(w_url_email),
        )
        .when(F.col("author_url").isNull(), F.max("author_url").over(w_by_source))
        .otherwise(F.col("author_url")),
    )
    w_email_url = Window.partitionBy("author_t", "author_url")
    df = df.withColumn(
        "author_email_f",
        F.when(
            F.col("author_email_c").isNull() & F.col("author_url").isNotNull(),
            F.max("author_email_c").over(w_email_url),
        )
        .when(
            F.col("author_email_c").isNull(),
            F.max("author_email_c").over(w_by_source),
        )
        .otherwise(F.col("author_email_c")),
    )

    # fixed_publishdate (transformed.sql:191-205): disjunctive MIN via
    # least() of three branch windows on the *raw* author (the reference
    # correlates against DROP_URL_AUTHOR, before trimming).
    df = df.withColumn("content_h", F.md5("article_content"))
    b1 = F.min("publishedat").over(
        Window.partitionBy("author_t", "title", "author", "news_source_name")
    )
    b2 = F.when(
        F.col("url").isNotNull(),
        F.min("publishedat").over(
            Window.partitionBy("author_t", "url", "author", "news_source_name")
        ),
    )
    b3 = F.when(
        F.col("article_content").isNotNull(),
        F.min("publishedat").over(
            Window.partitionBy("author_t", "content_h", "author", "news_source_name")
        ),
    )
    df = df.withColumn(
        "publishedat_fixed", F.least(b1, F.coalesce(b2, b1), F.coalesce(b3, b1))
    )

    # NO_TS (transformed.sql:208-233): name split + source exclusion.
    df = df.filter(~F.col("news_source_name").isin(*excluded_sources))
    df = df.withColumn(
        "first_name", F.split_part(F.col("author_t"), F.lit(" "), F.lit(1))
    ).withColumn("last_name", F.split_part(F.col("author_t"), F.lit(" "), F.lit(2)))

    # HASHED (transformed.sql:236-244): dbt_utils surrogate keys.
    return df.select(
        "id",
        "news_source_name",
        "news_source_country",
        "news_category",
        "first_name",
        "last_name",
        F.col("author_email_f").alias("author_email"),
        F.col("author_url_f").alias("author_url"),
        "title",
        "description",
        "url",
        F.col("publishedat_fixed").alias("publishedat"),
        "article_content",
        "bias",
        "creation_time",
        "article_content_clean",
        surrogate_key("first_name", "last_name", "author_url_f", "author_email_f").alias(
            "author_id"
        ),
        surrogate_key("news_source_name", "article_content_clean").alias("article_id"),
        surrogate_key(
            "first_name",
            "last_name",
            "author_url_f",
            "author_email_f",
            "news_source_name",
            "title",
            "article_content_clean",
        ).alias("article_author_id"),
        surrogate_key("news_source_name", "news_source_country").alias("source_id"),
        F.lit(run_ts).alias("load_ts_utc"),
    )


def articles_mart(transformed_df: DataFrame) -> DataFrame:
    """datamarts/articles.sql:7-58 — one row per article_id, newest
    creation_time (deterministic tiebreak: id DESC)."""
    return latest_row_per_key(
        transformed_df, keys=["article_id"], ts_col="creation_time", tiebreakers=["id"]
    ).select(
        "article_id",
        "title",
        "description",
        "news_category",
        "article_content",
        "url",
        "publishedat",
        "source_id",
    )


def authors_mart(transformed_df: DataFrame) -> DataFrame:
    """datamarts/authors.sql:1-11 — DISTINCT author dimension."""
    return transformed_df.select(
        "author_id", "first_name", "last_name", "author_email", "author_url"
    ).distinct()


def sources_mart(transformed_df: DataFrame) -> DataFrame:
    """datamarts/sources.sql:1-10 — DISTINCT source dimension."""
    return transformed_df.select(
        "source_id", "news_source_name", "news_source_country", "bias"
    ).distinct()


def bridge_mart(transformed_df: DataFrame) -> DataFrame:
    """datamarts/article_author_join_table.sql:1-8 — DISTINCT bridge."""
    return transformed_df.select("article_author_id", "author_id", "article_id").distinct()


def stg_sentiment(sentiment_raw: DataFrame, run_ts: str = DEFAULT_RUN_TS) -> DataFrame:
    """staging/stg_sentiment.sql:1-16 — 'N/A' scrub (F8) + load ts.

    Divergence: both score columns are typed DOUBLE here (the reference
    leaves them semi-typed text and only scrubs sentiment_poilievre,
    SURVEY.md §1.2).
    """
    na_to_null = lambda c: F.when(F.col(c) == "N/A", None).otherwise(  # noqa: E731
        F.col(c).cast("double")
    )
    return sentiment_raw.select(
        "id",
        "article_id",
        na_to_null("sentiment_mark").alias("sentiment_mark"),
        na_to_null("sentiment_poilievre").alias("sentiment_poilievre"),
        F.lit(run_ts).alias("load_ts_utc"),
    )


def sentiment_mart(stg_sentiment_df: DataFrame) -> DataFrame:
    """datamarts/sentiment.sql:1-7 — pass-through materialization."""
    return stg_sentiment_df
