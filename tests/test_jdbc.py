"""Live JDBC round-trip for write_jdbc / read_jdbc (S11/S13/S17).

The reference bulk-loads Postgres via COPY (newsairflowtasks.py:73-95)
and reads it back with get_pandas_df (sentiment_dashboard.py); the
Spark twin is the JDBC sink/source. No Postgres in the sandbox, so the
round-trip runs against the embedded Derby engine that ships inside
the Spark distribution (jars/derby-*.jar) — a real JDBC driver,
exercising the same DataFrameWriter/Reader JDBC code path a cluster
would use against Postgres (only the url/driver options differ).
"""

from __future__ import annotations

import uuid

import pytest

from canadiannewsdatapipeline_spark.sources.io import read_jdbc, write_jdbc

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby_url(tmp_path_factory) -> str:
    db = tmp_path_factory.mktemp("derby") / f"db_{uuid.uuid4().hex[:8]}"
    return f"jdbc:derby:{db};create=true"


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    # Derby writes derby.log to user.dir (the repo root under pytest)
    # unless told otherwise; point it at the test tmp dir BEFORE the
    # embedded driver first loads, which is when the property is read
    log = tmp_path_factory.mktemp("derby") / "derby.log"
    spark.sparkContext._jvm.System.setProperty("derby.stream.error.file", str(log))
    return _derby_url(tmp_path_factory)


def test_jdbc_write_read_roundtrip(spark, derby_url):
    df = spark.createDataFrame(
        [(1, "cbc", 0.75), (2, "ctv", -0.25), (3, "global", 0.0)],
        "article_id long, source string, sentiment double",
    )
    write_jdbc(df, derby_url, "articles_rt", mode="overwrite", driver=DRIVER)
    back = read_jdbc(spark, derby_url, "articles_rt", driver=DRIVER)
    assert sorted(back.columns) == ["article_id", "sentiment", "source"]
    rows = {r.article_id: (r.source, r.sentiment) for r in back.collect()}
    assert rows == {1: ("cbc", 0.75), 2: ("ctv", -0.25), 3: ("global", 0.0)}


def test_jdbc_append_mode(spark, derby_url):
    df1 = spark.createDataFrame([(10, "a")], "id long, v string")
    df2 = spark.createDataFrame([(11, "b")], "id long, v string")
    write_jdbc(df1, derby_url, "append_rt", mode="overwrite", driver=DRIVER)
    write_jdbc(df2, derby_url, "append_rt", mode="append", driver=DRIVER)
    back = read_jdbc(spark, derby_url, "append_rt", driver=DRIVER)
    assert {r.id for r in back.collect()} == {10, 11}


def test_jdbc_pushdown_filter(spark, derby_url):
    """Predicate applied on top of the JDBC source reaches the remote
    scan (JDBCRelation PushedFilters) rather than filtering in Spark."""
    df = spark.createDataFrame([(i, i % 3) for i in range(30)], "id long, grp long")
    write_jdbc(df, derby_url, "pd_rt", mode="overwrite", driver=DRIVER)
    back = read_jdbc(spark, derby_url, "pd_rt", driver=DRIVER).filter("grp = 1")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "grp" in plan
    assert {r.grp for r in back.collect()} == {1}
