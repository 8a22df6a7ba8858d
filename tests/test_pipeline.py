"""End-to-end News_Ingestion pipeline: fixture pages -> marts."""

from __future__ import annotations

from canadiannewsdatapipeline_spark.operators.quality import (
    checks_summary,
    relationship_violations,
    unique_violations,
)
from canadiannewsdatapipeline_spark.plans.pipeline import run_ingestion
from canadiannewsdatapipeline_spark.sources.scrape import FixtureFetcher, fixture_parser


def _article(title: str, author: str, body: str, date: str = "Mar 4, 2024") -> str:
    return (
        f"<h1>{title}</h1>"
        f'<meta name="description" content="{title} desc">'
        f"<time>{date}</time>"
        f"<address>{author}</address>"
        f"<p>{body}</p><p>Reach {author.split()[0].lower()}@mail.ca now.</p>"
    )


def test_run_ingestion_end_to_end(spark, tmp_path):
    pages_g = spark.createDataFrame(
        [("globe", "https://g.ca",
          '<a href="/politics/a1">x</a><a href="/politics/a2">y</a>')],
        "source string, base_url string, html string",
    )
    pages_p = spark.createDataFrame(
        [("post", "https://p.ca", '<a href="/politics/b1">z</a>')],
        "source string, base_url string, html string",
    )
    fetcher = FixtureFetcher(
        {
            "https://g.ca/politics/a1": _article("Budget Passes", "Ann Smith", "Vote happened."),
            "https://g.ca/politics/a2": _article("Rates Hold", "Bob Jones", "Bank said so."),
            "https://p.ca/politics/b1": _article("Trade Deal", "Cai Wu", "Signed today."),
        }
    )
    out = run_ingestion(
        spark,
        {"globe": pages_g, "post": pages_p},
        fetcher,
        fixture_parser,
        run_ts="2024-03-05 00:00:00",
        warehouse_dir=str(tmp_path),
    )
    arts, auths = out["articles"], out["authors"]
    assert arts.count() == 3
    assert {r.first_name for r in auths.collect()} == {"Ann", "Bob", "Cai"}
    # marts materialized to the warehouse
    assert (tmp_path / "articles").exists()
    # star integrity holds end-to-end
    summary = {
        r.check_name: r.n_violations
        for r in checks_summary(
            [
                ("unique", unique_violations(arts, ["article_id"])),
                ("fk", relationship_violations(
                    out["article_author_join_table"], "article_id", arts, "article_id")),
            ]
        ).collect()
    }
    assert summary == {"unique": 0, "fk": 0}
    # emails were enriched from page bodies
    emails = {r.author_email for r in auths.collect()}
    assert "ann@mail.ca" in emails
