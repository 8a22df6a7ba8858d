"""Differential-oracle harness: replicates the driver's correctness gate.

For every registered query, run the Spark callable and the DuckDB
oracle on the same parquet tables, then compare row count, column
names, and an order-insensitive value multiset (stringified, floats
canonicalized to 10 significant digits).
"""

from __future__ import annotations

import math
import os
from collections import Counter
from datetime import date, datetime
from decimal import Decimal

import duckdb
import pytest

from canadiannewsdatapipeline_spark.queries import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, Decimal):
        return f"{float(v):.10g}"
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _multiset(rows, col_order):
    return Counter(
        tuple(_canon(row[i]) for i in col_order) for row in rows
    )


def duck_con_for_dir(sf_dir: str, tables=TABLES):
    """Oracle connection over an arbitrary warehouse dir — reused by
    the adversarial-data parity tests (e.g. NULL-element embeddings)
    so they compare with the exact same view setup the driver uses."""
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def duck_con():
    return duck_con_for_dir(SF_DIR)


ORACLE_CASES = sorted(n for n, s in QUERIES.items() if s.oracle is not None)
ROWS_ONLY_CASES = sorted(n for n, s in QUERIES.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_oracle_parity(spark, name):
    spec = QUERIES[name]
    sdf = spec.fn(spark, SF_DIR)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = duck_con()
    res = con.execute(spec.oracle)
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )

    s_order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    d_order = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    s_ms = _multiset(spark_rows, s_order)
    d_ms = _multiset(duck_rows, d_order)
    if s_ms != d_ms:
        only_s = list((s_ms - d_ms).items())[:5]
        only_d = list((d_ms - s_ms).items())[:5]
        pytest.fail(
            f"{name}: value mismatch\n only-spark: {only_s}\n only-duck: {only_d}"
        )


@pytest.mark.parametrize("name", ROWS_ONLY_CASES)
def test_rows_only_queries_run(spark, name):
    spec = QUERIES[name]
    sdf = spec.fn(spark, SF_DIR)
    assert sdf.count() >= 0
    assert len(sdf.schema.fields) > 0
