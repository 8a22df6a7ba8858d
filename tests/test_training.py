"""Unit tests for the training-corpus operators and the as-of join."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from canadiannewsdatapipeline_spark.operators.asof import asof_join, dedup_right_ties
from canadiannewsdatapipeline_spark.operators.training import (
    pack_token_shards,
    train_val_test_split,
    weighted_source_mix,
)


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_join_basic_and_no_match(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "a"),
         (1, _ts("2024-01-01T12:00:00"), "b"),
         (2, _ts("2024-01-01T09:00:00"), "c")],  # before any right row
        "k long, ts timestamp, lv string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:30:00"), 100),
         (1, _ts("2024-01-01T11:00:00"), 200),
         (2, _ts("2024-01-01T09:30:00"), 300)],
        "k long, ts timestamp, rv long",
    )
    out = {(r.k, r.lv): (r.rv, r.asof_ts)
           for r in asof_join(left, right, ["k"], "ts", "ts", ["rv"]).collect()}
    assert out[(1, "a")][0] == 100     # most recent prior
    assert out[(1, "b")][0] == 200     # advances past the newer right row
    assert out[(2, "c")] == (None, None)  # left row precedes all right rows


def test_asof_join_inclusive_on_equal_ts(spark):
    t = _ts("2024-01-01T10:00:00")
    left = spark.createDataFrame([(1, t, "x")], "k long, ts timestamp, lv string")
    right = spark.createDataFrame([(1, t, 7)], "k long, ts timestamp, rv long")
    [row] = asof_join(left, right, ["k"], "ts", "ts", ["rv"]).collect()
    assert row.rv == 7  # ts >= semantics: same-instant right row matches


def test_dedup_right_ties_keeps_max_tiebreaker(spark):
    t = _ts("2024-01-01T10:00:00")
    right = spark.createDataFrame(
        [(1, t, 5, "low"), (1, t, 9, "high")],
        "k long, ts timestamp, tb long, v string",
    )
    [row] = dedup_right_ties(right, ["k"], "ts", "tb").collect()
    assert (row.tb, row.v) == (9, "high")  # whole row of the max tiebreaker


def test_split_is_stable_under_growth(spark):
    base = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    grown = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    s1 = {r.doc_id: r.split for r in train_val_test_split(base, "doc_id").collect()}
    s2 = {r.doc_id: r.split for r in train_val_test_split(grown, "doc_id").collect()}
    assert all(s2[k] == v for k, v in s1.items())  # no reshuffling on growth
    assert {"train", "val", "test"} == set(s2.values())


def test_weighted_mix_rates(spark):
    df = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "keep_all").otherwise("drop_all").alias("source"),
    )
    out = weighted_source_mix(
        df, "doc_id", "source", {"keep_all": 1.0, "drop_all": 0.0}
    ).groupBy("source").count().collect()
    rates = {r.source: r["count"] for r in out}
    assert rates.get("keep_all") == 1000 and "drop_all" not in rates


def test_pack_token_shards_budget(spark):
    docs = spark.createDataFrame(
        [(i, "w " * 100, "g") for i in range(10)],  # 100 tokens each
        "doc_id long, text string, source string",
    )
    out = pack_token_shards(docs, "doc_id", "text", "source", budget=250).collect()
    shards = {r.id: r.shard_id for r in out}
    # offsets 0,100,...,900 over budget 250 -> shard = offset // 250
    assert shards == {i: (i * 100) // 250 for i in range(10)}
    assert all(r.n_tokens == 100 for r in out)
