"""Extract-layer tests with fixture HTML (mirrors the reference's own
test strategy: stored pages + golden field values, SURVEY.md §5.1)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from canadiannewsdatapipeline_spark.operators.validate import (
    news_record_rules,
    scrub_invalid_authors,
    validate,
)
from canadiannewsdatapipeline_spark.sources.scrape import (
    FixtureFetcher,
    enrich_author_emails,
    explode_authors,
    extract_links,
    finalize_records,
    fetch_pages,
    fixture_parser,
    parse_articles,
    robots_filter,
)

LINK_PAGE = (
    '<a href="/politics/a1">one</a> <a href="https://x.ca/politics/a2">two</a> '
    '<a href="/sports/s1">skip</a> <a href="/politics/a1">dup</a> '
    '<a href="/politics/a3">three</a>'
)

ARTICLE = (
    "<h1>Budget Passes</h1>"
    '<meta name="description" content="The budget passed today">'
    "<time>Mar 4, 2024</time>"
    "<address>Ann Smith, Bob Jones</address>"
    "<p>Parliament voted.</p><p>Contact ann@x.ca for details.</p>"
)


def test_extract_links_golden(spark):
    pages = spark.createDataFrame(
        [("x", "https://x.ca", LINK_PAGE)], "source string, base_url string, html string"
    )
    links = extract_links(pages, keyword="politics", top_n=10)
    urls = [r.url for r in links.orderBy("pos").collect()]
    # keyword filter, absolutized, order-preserving dedup
    assert urls == [
        "https://x.ca/politics/a1",
        "https://x.ca/politics/a2",
        "https://x.ca/politics/a3",
    ]


def test_robots_filter(spark):
    links = spark.createDataFrame(
        [("x", "https://x.ca/politics/a1"), ("x", "https://x.ca/private/p1")],
        "source string, url string",
    )
    disallowed = spark.createDataFrame(
        [("https://x.ca", "/private")], "base_url string, path_prefix string"
    )
    kept = [r.url for r in robots_filter(links, disallowed).collect()]
    assert kept == ["https://x.ca/politics/a1"]


def test_fetch_parse_fanout_golden(spark):
    links = spark.createDataFrame(
        [("x", "https://x.ca/politics/a1")], "source string, url string"
    )
    fetcher = FixtureFetcher({"https://x.ca/politics/a1": ARTICLE})
    pages = fetch_pages(links, fetcher)
    parsed = parse_articles(pages, fixture_parser)
    rows = explode_authors(parsed).collect()
    assert [r.author for r in rows] == ["Ann Smith", "Bob Jones"]
    r = rows[0]
    assert r.title == "Budget Passes"
    assert r.description == "The budget passed today"
    assert "Parliament voted." in r.article_content

    final = finalize_records(enrich_author_emails(explode_authors(parsed)))
    f = final.first()
    assert f.author_email == "ann@x.ca"
    assert f.publishedat == datetime(2024, 3, 4)  # 'MMM d, yyyy' parse
    assert f.source_name == "x" and f.language == "english"


def test_validate_rules_and_author_scrub(spark):
    df = spark.createDataFrame(
        [
            ("T", datetime(2024, 1, 1), "g", "a@x.ca", "left", "Ann Smith"),
            (None, datetime(2024, 1, 1), "g", "a@x.ca", "left", "Ann Smith"),
            ("T", datetime(2024, 1, 1), "g", "not-an-email", "left", "Ann Smith"),
            ("T", datetime(2024, 1, 1), "g", None, "weird", "Ann Smith"),
            ("T", datetime(2024, 1, 1), "g", None, "left", "www.facebook.com!!"),
        ],
        "title string, publishedat timestamp, source_name string, "
        "author_email string, bias string, author string",
    )
    out = validate(df, news_record_rules())
    got = [(r.valid, r.reject_reason) for r in out.collect()]
    assert got == [
        (True, None),
        (False, "title_null"),
        (False, "author_email_format"),
        (False, "bias_domain"),
        (True, None),
    ]
    scrubbed = scrub_invalid_authors(out)
    assert [r.author for r in scrubbed.collect()] == [
        "Ann Smith", "Ann Smith", "Ann Smith", "Ann Smith", None
    ]


def test_csv_staging_roundtrip(spark, tmp_path):
    from canadiannewsdatapipeline_spark.sources.io import (
        read_staging_csv,
        write_staging_csv,
    )

    df = spark.createDataFrame([(2, "b"), (1, "a")], "id long, v string")
    path = str(tmp_path / "stage")
    write_staging_csv(df, path, ["v", "id"], add_ingest_ts=False)
    back = read_staging_csv(spark, path, "v string, id long")
    assert sorted((r.v, r.id) for r in back.collect()) == [("a", 1), ("b", 2)]


def test_append_raw_accumulates_batches(spark, tmp_path):
    from canadiannewsdatapipeline_spark.sources.io import append_raw

    path = str(tmp_path / "raw")
    b1 = spark.createDataFrame([(1, "a")], "id long, v string")
    b2 = spark.createDataFrame([(2, "b")], "id long, v string")
    append_raw(b1, path)
    append_raw(b2, path)  # 3-hourly cron appends, never overwrites
    assert sorted(r.id for r in spark.read.parquet(path).collect()) == [1, 2]


def test_author_email_retry_chain_golden(spark):
    """Golden test for the enrichment retry POLICY (reference
    get_news_manual.py:99-264 + test_news/test_author_finder.py): the
    try-author-page -> repaired-base-url -> https-prefixed -> article-
    content-regex fallback chain, expressed as one distinct-URL fetch +
    priority min_by."""
    from canadiannewsdatapipeline_spark.sources.scrape import (
        FixtureFetcher,
        author_email_retry_chain,
    )

    base = "https://example.com"
    pages = {
        # A: direct author_url works
        "https://example.com/authors/amy": '<a href="mailto:amy@example.com">e</a>',
        # B: relative author_url 404s; repaired base+url page has the email
        "https://example.com/authors/bob": "<p>bob@example.com</p>",
        # C: protocol-less url; only the https:-prefixed variant resolves
        "https://example.com/authors/cat": "<p>cat@example.com</p>",
    }
    rows = [
        # (article url, base_url, author_url, content). Row C uses a
        # schemeless base: per verify_base_url's substring check the
        # https: repair can only ever fire when base_url carries no
        # scheme itself.
        ("u/a", base, "https://example.com/authors/amy", "no email here"),
        ("u/b", base, "/authors/bob", "none here either"),
        ("u/c", "example.com", "//example.com/authors/cat", "nope"),
        ("u/d", base, None, "contact dan@example.com for info"),  # naive content
        ("u/e", base, "/authors/missing", "nothing anywhere"),  # all miss -> NULL
    ]
    df = spark.createDataFrame(
        rows,
        "url string, base_url string, author_url string, article_content string",
    )
    out = author_email_retry_chain(df, FixtureFetcher(pages))
    got = {r.url: r.author_email for r in out.collect()}
    assert got == {
        "u/a": "amy@example.com",
        "u/b": "bob@example.com",
        "u/c": "cat@example.com",
        "u/d": "dan@example.com",
        "u/e": None,
    }


def test_author_email_retry_chain_settings_extractor(spark):
    """email_search_settings path: a caller-supplied page extractor
    (the tag/attrs walk) replaces the regex leaf, mirroring
    AuthorFinder._get_email_search_settings (mailto: stripped,
    '@'-bearing hrefs only)."""
    import re

    from canadiannewsdatapipeline_spark.sources.scrape import (
        FixtureFetcher,
        author_email_retry_chain,
    )

    def settings_extractor(html: str) -> str | None:
        hrefs = re.findall(r'<a class="share" href="([^"]+)"', html)
        emails = sorted({h for h in hrefs if "@" in h})
        return emails[0].replace("mailto:", "") if emails else None

    pages = {
        "https://example.com/authors/amy": (
            '<a class="share" href="mailto:amy@example.com">mail</a>'
            '<a class="other" href="mailto:decoy@example.com">x</a>'
        )
    }
    df = spark.createDataFrame(
        [("u/a", "https://example.com", "https://example.com/authors/amy", "c")],
        "url string, base_url string, author_url string, article_content string",
    )
    out = author_email_retry_chain(
        df, FixtureFetcher(pages), extractor=settings_extractor
    )
    assert out.collect()[0].author_email == "amy@example.com"
