"""Golden end-to-end test of the news model DAG on a hand-built
raw_news fixture (FIXTURES.md §1 shapes: backfills, facebook authors,
re-scrapes, N/A sentiment)."""

from __future__ import annotations

from datetime import datetime

import pytest

from canadiannewsdatapipeline_spark.operators.quality import (
    checks_summary,
    not_null_violations,
    relationship_violations,
    unique_violations,
)
from canadiannewsdatapipeline_spark.plans.models import (
    articles_mart,
    authors_mart,
    bridge_mart,
    sentiment_mart,
    sources_mart,
    stg_articles,
    stg_sentiment,
    transformed,
)

TS = datetime(2024, 1, 5, 12, 0, 0)
TS2 = datetime(2024, 1, 6, 12, 0, 0)
ING1 = datetime(2024, 3, 1, 0, 0, 0)
ING2 = datetime(2024, 3, 1, 3, 0, 0)

COLS = (
    "id long, source_name string, source_country string, category string, "
    "author string, author_email string, author_url string, title string, "
    "description string, url string, publishedat timestamp, "
    "article_content string, bias string, language string, ingest_ts timestamp"
)


@pytest.fixture(scope="module")
def raw_news(spark):
    rows = [
        # re-scrape pair: same article, later publishedat + ingest on the rescrape,
        # content missing on the rescrape but email+url present -> backfill fires
        (1, "globe", "ca", "politics", "Ann Smith", "ann@x.ca", "https://g/a",
         "T1", "d", "https://g/1", TS, "Body one.", "left", "english", ING1),
        (2, "globe", "ca", "politics", "Ann Smith", "ann@x.ca", "https://g/a",
         "T1", "d", "https://g/1", TS2, None, "left", "english", ING2),
        # author with missing url, twin (by author+email) has it
        (3, "post", "ca", "politics", "Bob Jones", "bob@x.ca", None,
         "T2", "d", "https://p/2", TS, "Body two.", "right", "english", ING1),
        (4, "post", "ca", "politics", "Bob Jones", "bob@x.ca", "https://p/b",
         "T3", "d", "https://p/3", TS, "Body three.", "right", "english", ING1),
        # facebook + NULL authors -> dropped
        (5, "post", "ca", "politics", "www.facebook.com", None, None,
         "T4", "d", "https://p/4", TS, "Body四.", "centre", "english", ING1),
        (6, "post", "ca", "politics", None, None, None,
         "T5", "d", "https://p/5", TS, "Body five.", "centre", "english", ING1),
        # excluded source
        (7, "cbc", "ca", "politics", "Cat Lee", None, None,
         "T6", "d", "https://c/6", TS, "Body six.", "centre", "english", ING1),
        # whitespace + single-token author
        (8, "globe", "ca", "politics", "  Dee Dale ", None, None,
         "T7", "d", "https://g/8", TS, "Body seven.", "left", "french", ING1),
        (9, "globe", "ca", "politics", "Mononym", "MONO@X.CA\n", None,
         "T8", "d", "https://g/9", TS, "Body eight.", "left", "english", ING1),
    ]
    return spark.createDataFrame(rows, COLS)


@pytest.fixture(scope="module")
def tr(raw_news):
    return transformed(stg_articles(raw_news)).cache()


def test_drops_and_exclusions(tr):
    ids = {r.id for r in tr.select("id").collect()}
    assert ids == {1, 2, 3, 4, 8, 9}  # 5 (facebook), 6 (null), 7 (cbc) gone


def test_content_backfill_and_latest_dedup(tr):
    row2 = tr.filter("id = 2").first()
    assert row2.article_content == "Body one."  # backfilled from id 1
    # both rescrapes share article_id; mart keeps the latest ingest
    arts = articles_mart(tr)
    a = arts.filter("title = 'T1'").collect()
    assert len(a) == 1


def test_publishdate_min_fix(tr):
    # the rescrape (id=2, later publishedat) is pulled back to TS
    assert tr.filter("id = 2").first().publishedat == TS


def test_url_backfill_two_branch(tr):
    assert tr.filter("id = 3").first().author_url == "https://p/b"


def test_email_cleaning_and_name_split(tr):
    r9 = tr.filter("id = 9").first()
    assert r9.author_email == "mono@x.ca"  # lowered, newline stripped
    assert r9.first_name == "Mononym" and r9.last_name == ""
    r8 = tr.filter("id = 8").first()
    assert (r8.first_name, r8.last_name) == ("Dee", "Dale")


def test_star_schema_quality(spark, tr):
    arts, auths, bridge = articles_mart(tr), authors_mart(tr), bridge_mart(tr)
    sent_raw = spark.createDataFrame(
        [(1, arts.first().article_id, "0.8", "N/A", ING1)],
        "id long, article_id string, sentiment_mark string, "
        "sentiment_poilievre string, ingest_ts timestamp",
    )
    sent = sentiment_mart(stg_sentiment(sent_raw))
    assert sent.first().sentiment_poilievre is None  # N/A scrub
    assert sent.first().sentiment_mark == 0.8
    summary = {
        r.check_name: r.n_violations
        for r in checks_summary(
            [
                ("articles_unique", unique_violations(arts, ["article_id"])),
                ("articles_nn", not_null_violations(arts, "article_id")),
                ("bridge_fk_articles",
                 relationship_violations(bridge, "article_id", arts, "article_id")),
                ("bridge_fk_authors",
                 relationship_violations(bridge, "author_id", auths, "author_id")),
                ("sentiment_fk",
                 relationship_violations(sent, "article_id", arts, "article_id")),
                ("sources_unique",
                 unique_violations(
                     sources_mart(tr),
                     ["source_id", "news_source_name", "news_source_country", "bias"],
                 )),
            ]
        ).collect()
    }
    assert all(v == 0 for v in summary.values()), summary
