"""Scrape-side sources re-expressed Spark-first (SURVEY.md §2.1 S1-S9).

The reference's extract layer is driver-style Python: requests/Selenium
fetches (get_news.py:83-112), BeautifulSoup link extraction
(utils.py:36-74), robots.txt gating (utils.py:17-33), newspaper4k /
manual parsing (get_news.py:244-247, get_news_manual.py:354-457), and
author enrichment (get_news.py:115-161). Our engine keeps the exogenous
I/O behind tiny plugin protocols (Fetcher/ArticleParser — the Selenium
variant is just another Fetcher) and does everything data-shaped as
DataFrame ops, so a million-URL frontier partitions across executors:

- link extraction: regexp over an html column + posexplode (S2)
- keyword/prefix/skip/top-n link filters (P11, O4, P12)
- order-preserving dedup (U2)
- robots gate as a broadcast-joined filter (S5)
- fetch + parse as Arrow-batched mapInPandas stages (S3, S6/S7)
- author fan-out via explode (UD5) + email regex enrichment (S8)

Network fetchers don't exist in this environment; FixtureFetcher /
FixtureParser are the deterministic test implementations, matching the
reference's own fixture-HTML test strategy (SURVEY.md §5.1).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.cleaning import EMAIL_PATTERN

HREF_RE = r'href="([^"]+)"'

Fetcher = Callable[[str], str]
ArticleParser = Callable[[str, str], dict]  # (url, html) -> record dict


class FixtureFetcher:
    """Deterministic in-memory fetcher (tests patch network I/O the
    same way, test_get_news.py:102-103)."""

    def __init__(self, pages: dict[str, str]):
        self.pages = pages

    def __call__(self, url: str) -> str:
        return self.pages.get(url, "")


def requests_fetcher(url: str) -> str:
    """The production HTTP fetcher (get_news.py:83-112). Needs network
    access; not available in this environment."""
    raise NotImplementedError(
        "network fetch disabled in this environment; inject FixtureFetcher"
    )


def extract_links(
    pages: DataFrame,
    source_col: str = "source",
    html_col: str = "html",
    base_url_col: str = "base_url",
    keyword: str | None = None,
    skip_n: int = 0,
    top_n: int | None = None,
) -> DataFrame:
    """Link-page scan (S2, utils.py:36-74): extract hrefs in document
    order, keep keyword matches, absolutize relative URLs, dedup
    keeping first occurrence, skip the first ``skip_n``, cap at
    ``top_n`` per source — all window/filter ops, no driver loops."""
    links = pages.select(
        source_col,
        base_url_col,
        F.posexplode(
            F.expr(f"regexp_extract_all({html_col}, '{HREF_RE}', 1)")
        ).alias("pos", "url"),
    )
    if keyword:
        links = links.filter(F.col("url").contains(keyword))
    links = links.withColumn(
        "url",
        F.when(
            F.col("url").startswith("http"), F.col("url")
        ).otherwise(F.concat(F.col(base_url_col), F.col("url"))),
    )
    # order-preserving dedup (utils.py:72) then positional slice
    w = Window.partitionBy(source_col, "url").orderBy("pos")
    links = (
        links.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    wpos = Window.partitionBy(source_col).orderBy("pos")
    links = links.withColumn("rank", F.row_number().over(wpos)).filter(
        F.col("rank") > skip_n
    )
    if top_n is not None:
        links = links.filter(F.col("rank") <= skip_n + top_n)
    return links.select(source_col, base_url_col, "pos", "url")


def robots_filter(
    links: DataFrame, disallowed: DataFrame, url_col: str = "url"
) -> DataFrame:
    """robots.txt gate (S5, utils.py:17-33) as a broadcast anti-match:
    ``disallowed`` is a tiny (base_url, path_prefix) frame parsed from
    each site's robots.txt; a link is fetchable unless some disallowed
    prefix matches."""
    d = F.broadcast(
        disallowed.select(
            F.col("base_url").alias("d_base"), F.col("path_prefix").alias("d_prefix")
        )
    )
    joined = links.join(
        d,
        F.col(url_col).startswith(F.concat(F.col("d_base"), F.col("d_prefix"))),
        "left",
    )
    return (
        joined.withColumn("blocked", F.col("d_prefix").isNotNull())
        .filter(~F.col("blocked"))
        .drop("d_base", "d_prefix", "blocked")
        .distinct()
    )


def fetch_pages(
    links: DataFrame, fetcher: Fetcher, url_col: str = "url"
) -> DataFrame:
    """HTML fetch (S3/S4) as a partition-batched mapInPandas stage.

    Politeness/parallelism policy (the reference's 2 s sleep and
    4-task cap) belongs to the Fetcher implementation — the engine
    just hands it partition-sized batches."""
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(links.schema.fields) + [T.StructField("html", T.StringType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["html"] = [fetcher(u) for u in pdf[url_col]]
            yield pdf

    return links.mapInPandas(run, out_schema)


_RECORD_FIELDS = [
    ("title", "string"),
    ("description", "string"),
    ("article_content", "string"),
    ("publishedat", "string"),
    ("authors", "array<string>"),
]


def parse_articles(
    pages: DataFrame, parser: ArticleParser, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Article parse (S6/S7) behind the parser plugin; one input row ->
    one parsed row with an authors array (fanned out by
    ``explode_authors``)."""
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(pages.schema.fields)
        + [T.StructField(n, T._parse_datatype_string(t)) for n, t in _RECORD_FIELDS]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = [parser(u, h) for u, h in zip(pdf[url_col], pdf[html_col])]
            pdf = pdf.copy()
            for name, _ in _RECORD_FIELDS:
                pdf[name] = [r.get(name) for r in recs]
            yield pdf

    return pages.mapInPandas(run, out_schema)


def fixture_parser(url: str, html: str) -> dict:
    """Deterministic parser for the manual-scraper markup shape
    (get_news_manual.py:354-457): fields in <h1>/<meta>/<p> tags,
    'MMM d, yyyy' dates, comma-separated authors in <address>."""
    import re

    def first(pattern: str) -> str | None:
        m = re.search(pattern, html, re.S)
        return m.group(1).strip() if m else None

    paras = re.findall(r"<p>(.*?)</p>", html, re.S)
    authors = first(r"<address>(.*?)</address>")
    return {
        "title": first(r"<h1>(.*?)</h1>"),
        "description": first(r'<meta name="description" content="([^"]*)"'),
        "article_content": " ".join(p.strip() for p in paras) if paras else None,
        "publishedat": first(r"<time>(.*?)</time>"),
        "authors": [a.strip() for a in authors.split(",")] if authors else [],
    }


def explode_authors(parsed: DataFrame) -> DataFrame:
    """Author fan-out (UD5, get_news.py:259-290): one article row per
    author; articles with no authors keep one row with NULL author."""
    return parsed.withColumn(
        "author",
        F.explode_outer(
            F.when(F.size("authors") > 0, F.col("authors")).otherwise(
                F.array(F.lit(None).cast("string"))
            )
        ),
    ).drop("authors")


def enrich_author_emails(
    df: DataFrame, html_col: str = "html", out_col: str = "author_email"
) -> DataFrame:
    """Regex email path of author enrichment (S8, utils.py:99-138):
    first email on the page, mailto: prefix stripped (F21)."""
    email = F.regexp_extract(F.col(html_col), EMAIL_PATTERN, 0)
    return df.withColumn(
        out_col,
        F.when(email == "", None).otherwise(
            F.regexp_replace(email, "^mailto:", "")
        ),
    )


def author_email_retry_chain(
    df: DataFrame,
    fetcher: Fetcher,
    key_col: str = "url",
    base_url_col: str = "base_url",
    author_url_col: str = "author_url",
    content_col: str = "article_content",
    out_col: str = "author_email",
    extractor: Callable[[str], str | None] | None = None,
) -> DataFrame:
    """Author-email enrichment retry POLICY as a data-parallel operator
    (get_news_manual.py:99-264 ``parse_author_info`` /
    ``_handle_author_email_not_found``).

    The reference retries imperatively per article: (1) fetch the
    author page at ``author_url`` and regex/settings-extract an email;
    (2) on miss, repair the URL with verify_base_url (prepend base_url
    when absent, utils.py:141-147) and retry; (3) on miss, prepend
    "https:" when missing and retry; (4) finally regex the article
    content itself (``get_author_email_naive``).

    Spark-first rewrite: the three candidate URLs per row are pure
    column algebra computed up front; the engine fetches each DISTINCT
    candidate URL exactly once (one Arrow-batched mapInPandas pass),
    extracts the email per page JVM-side, joins back, and takes the
    email of the lowest-numbered attempt that hit (``min_by``), falling
    back to the content regex. Distinct-URL fetching trades the
    reference's per-row early exit for cross-row fetch dedup — an
    author page shared by 10k articles is fetched once, not 10k times,
    which is the economy that matters at scale.

    Note: the reference discards step (3)'s result due to an
    unconditional ``author_email = None`` (get_news_manual.py:215); we
    implement the documented intent, not the bug.

    ``extractor`` is the optional settings-driven page extractor
    (``email_search_settings`` tag/attrs walk) applied inside the fetch
    batch; when None the page email is the first EMAIL_PATTERN match
    with any ``mailto:`` prefix stripped (the regex path).
    """
    url0 = F.col(author_url_col)
    url1 = F.when(
        F.col(author_url_col).contains(F.col(base_url_col)), url0
    ).otherwise(F.concat(F.col(base_url_col), url0))
    url2 = F.when(url1.contains("https:"), url1).otherwise(
        F.concat(F.lit("https:"), url1)
    )
    cands = df.select(
        key_col,
        F.posexplode(
            F.array_distinct(
                F.filter(F.array(url0, url1, url2), lambda u: u.isNotNull())
            )
        ).alias("attempt", "_cand_url"),
    )
    distinct_urls = cands.select("_cand_url").distinct()
    pages = fetch_pages(distinct_urls, fetcher, url_col="_cand_url")
    if extractor is not None:
        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField("_cand_url", T.StringType()),
                T.StructField("_page_email", T.StringType()),
            ]
        )

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "_cand_url": pdf["_cand_url"],
                        "_page_email": [extractor(h) for h in pdf["html"]],
                    }
                )

        page_emails = pages.mapInPandas(run, schema)
    else:
        email = F.regexp_extract(F.col("html"), EMAIL_PATTERN, 0)
        page_emails = pages.select(
            "_cand_url",
            F.when(email == "", None)
            .otherwise(F.regexp_replace(email, "^mailto:", ""))
            .alias("_page_email"),
        )
    hits = (
        cands.join(page_emails, "_cand_url")
        .filter(F.col("_page_email").isNotNull())
        .groupBy(key_col)
        .agg(F.min_by("_page_email", "attempt").alias("_chain_email"))
    )
    naive = F.regexp_extract(F.col(content_col), EMAIL_PATTERN, 0)
    return (
        df.join(hits, key_col, "left")
        .withColumn(
            out_col,
            F.coalesce(
                F.col("_chain_email"),
                F.when(naive == "", None).otherwise(naive),
            ),
        )
        .drop("_chain_email")
    )


def finalize_records(
    df: DataFrame, date_format: str = "MMM d, yyyy"
) -> DataFrame:
    """Assemble the 13-key scraper record (config/scraper_output_schema
    .json) with the manual scraper's date parse (F15,
    get_news_manual.py:419)."""
    return df.select(
        F.col("source").alias("source_name"),
        F.lit("ca").alias("source_country"),
        F.lit("politics").alias("category"),
        "author",
        "author_email",
        F.lit(None).cast("string").alias("author_url"),
        "title",
        "description",
        "url",
        F.to_timestamp("publishedat", date_format).alias("publishedat"),
        "article_content",
        F.lit(None).cast("string").alias("bias"),
        F.lit("english").alias("language"),
    )
