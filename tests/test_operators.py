"""Unit tests for the operator library on tiny in-memory frames."""

from __future__ import annotations

from pyspark.sql import functions as F

from canadiannewsdatapipeline_spark.functions.cleaning import clean_article_content
from canadiannewsdatapipeline_spark.functions.keys import surrogate_key
from canadiannewsdatapipeline_spark.operators.backfill import (
    backfill_within_group,
    disjunctive_group_min,
)
from canadiannewsdatapipeline_spark.operators.dedup import exact_dup_groups, jaccard_pairs
from canadiannewsdatapipeline_spark.operators.dedup_window import (
    keep_first_by_order,
    latest_row_per_key,
    top_n_per_group,
)
from canadiannewsdatapipeline_spark.operators.multimodal import (
    attach_binary_payload,
    decode_features,
)
from canadiannewsdatapipeline_spark.operators.quality import (
    checks_summary,
    relationship_violations,
    unique_violations,
)
from canadiannewsdatapipeline_spark.operators.textstats import fingerprint


def test_latest_row_per_key_tie_break(spark):
    df = spark.createDataFrame(
        [(1, 10, "a"), (1, 10, "b"), (2, 5, "c")], "k long, ts long, v string"
    )
    out = latest_row_per_key(df, ["k"], "ts", tiebreakers=["v"]).collect()
    got = {r.k: r.v for r in out}
    assert got == {1: "b", 2: "c"}  # ts tie broken by v DESC


def test_keep_first_by_order(spark):
    df = spark.createDataFrame(
        [("u", 3, "late"), ("u", 1, "early"), ("v", 2, "only")],
        "k string, pos long, v string",
    )
    got = {r.k: r.v for r in keep_first_by_order(df, ["k"], "pos").collect()}
    assert got == {"u": "early", "v": "only"}


def test_top_n_per_group(spark):
    df = spark.createDataFrame([("g", i) for i in range(10)], "g string, x long")
    out = top_n_per_group(df, ["g"], [F.col("x").desc()], 3).collect()
    assert sorted(r.x for r in out) == [7, 8, 9]


def test_backfill_within_group(spark):
    df = spark.createDataFrame(
        [("g1", None), ("g1", "x"), ("g2", None)], "g string, v string"
    )
    out = backfill_within_group(df, "v", ["g"], out_col="f")
    got = sorted((r.g, r.f) for r in out.collect())
    assert got == [("g1", "x"), ("g1", "x"), ("g2", None)]


def test_disjunctive_group_min(spark):
    # row 3 shares k1 with row 1 and k2 with row 2 -> takes global min 1
    df = spark.createDataFrame(
        [("a", "p", 5), ("b", "q", 1), ("a", "q", 9)], "k1 string, k2 string, ts long"
    )
    out = disjunctive_group_min(df, "ts", [("k1",), ("k2",)], "fixed")
    got = {(r.k1, r.k2): r.fixed for r in out.collect()}
    assert got[("a", "q")] == 1 and got[("a", "p")] == 5


def test_surrogate_key_matches_dbt_recipe(spark):
    import hashlib

    df = spark.createDataFrame([("x", None)], "a string, b string")
    got = df.select(surrogate_key("a", "b").alias("k")).first().k
    expected = hashlib.md5(b"x-_dbt_utils_surrogate_key_null_").hexdigest()
    assert got == expected


def test_clean_article_content(spark):
    df = spark.createDataFrame(
        [("Call me@x.com or www.foo.com\nmore Trending Now junk",)], "c string"
    )
    got = df.select(clean_article_content(F.col("c")).alias("o")).first().o
    assert "me@x.com" not in got and "www.foo.com" not in got
    assert "junk" not in got and "\n" not in got


def test_exact_dup_groups(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "other")], "id long, t string"
    )
    out = {r.canonical_id: r.n_dups for r in exact_dup_groups(df, "t", "id").collect()}
    assert out == {1: 2, 3: 1}  # case/whitespace-normalized dup found


def test_jaccard_pairs_identical_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f"), (3, "z y x w v u")],
        "id long, t string",
    )
    out = jaccard_pairs(df, "t", "id", n=3, threshold=0.9).collect()
    assert len(out) == 1 and out[0].id_a == 1 and out[0].id_b == 2
    assert abs(out[0].jaccard - 1.0) < 1e-12


def test_minhash_lsh_band_freq_clamp(spark):
    """Pathological corpus: 50 identical boilerplate docs would fan out
    to 50*49/2 = 1225 candidate pairs per band; the frequency clamp
    drops the flooded signature while genuinely-near pairs survive."""
    from canadiannewsdatapipeline_spark.operators.dedup import minhash_lsh_candidates

    boiler = [(i, "subscribe to our newsletter for daily updates today") for i in range(50)]
    near = [(100, "quick brown fox jumps over the lazy sleeping dog"),
            (101, "quick brown fox jumps over the lazy sleeping cat")]
    df = spark.createDataFrame(boiler + near, "id long, t string")

    unclamped = minhash_lsh_candidates(df, "t", "id").collect()
    assert len(unclamped) >= 1225  # quadratic fan-out on the boilerplate

    clamped = minhash_lsh_candidates(df, "t", "id", max_band_freq=10).collect()
    pairs = {(r.id_a, r.id_b) for r in clamped}
    assert (100, 101) in pairs  # near-dup tail survives the clamp
    assert all(a >= 100 for a, _ in pairs)  # flooded signature dropped
    assert len(clamped) < 50  # bounded join fan-out


def test_quality_checks(spark):
    child = spark.createDataFrame([(1,), (2,), (9,)], "fk long")
    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    dup = spark.createDataFrame([(1,), (1,), (2,)], "k long")
    summary = {
        r.check_name: r.n_violations
        for r in checks_summary(
            [
                ("fk", relationship_violations(child, "fk", parent, "pk")),
                ("uniq", unique_violations(dup, ["k"])),
            ]
        ).collect()
    }
    assert summary == {"fk": 1, "uniq": 1}


def test_fingerprint_order_insensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma alpha beta"), (3, "delta")],
        "id long, t string",
    )
    rows = {r.id: r.fingerprint for r in fingerprint(df, "t", "id").collect()}
    assert rows[1] == rows[2] and rows[1] != rows[3]


def test_multimodal_decode_roundtrip(spark):
    df = spark.createDataFrame([(1, "some payload"), (2, "other")], "id long, t string")
    feats = decode_features(attach_binary_payload(df, "t", "id")).collect()
    assert len(feats) == 2
    f1 = next(r for r in feats if r.id == 1)
    assert f1.n_bytes == len(b"some payload") and f1.channels == 3
    assert 0.0 <= f1.feat_mean <= 1.0
    # deterministic: same payload -> same features
    again = decode_features(attach_binary_payload(df, "t", "id")).collect()
    assert sorted(map(tuple, feats)) == sorted(map(tuple, again))


def test_real_decode_is_stubbed():
    import pytest

    from canadiannewsdatapipeline_spark.operators.multimodal import real_decode

    with pytest.raises(NotImplementedError):
        real_decode(b"bytes")


def test_chunking_udtf_matches_sql(spark):
    # §2.10 UDTF surface: a Python UDTF is the extension seam for
    # tokenizer-aware chunkers; for plain char windows it must agree
    # with the pure-SQL chunking query exactly
    from pyspark.sql.functions import udtf

    from canadiannewsdatapipeline_spark.queries import QUERIES

    @udtf(returnType="chunk_idx int, chunk string")
    class Chunker:
        def eval(self, text: str, size: int, step: int):
            i, idx = 0, 0
            while i < len(text):
                yield idx, text[i : i + size]
                idx += 1
                i += step

    spark.udtf.register("chunker_udtf", Chunker)
    from canadiannewsdatapipeline_spark.sources.registry import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    docs.filter("doc_id % 10 = 0").createOrReplaceTempView("_chunk_docs")
    via_udtf = spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk
        FROM _chunk_docs d, LATERAL chunker_udtf(d.text, 256, 224) c
        """
    )
    sql_side = QUERIES["text_chunk_overlap"].fn(spark, "/root/testdata/sf0.001")
    a = {(r.doc_id, r.chunk_idx, r.chunk) for r in via_udtf.collect()}
    b = {(r.doc_id, r.chunk_idx, r.chunk) for r in sql_side.collect()}
    assert a == b and len(a) > 0
