"""Source/sink format breadth: the same frame must survive a
round-trip through every built-in columnar/text format Spark ships
(parquet, ORC, CSV, JSON) with schema enforced on read."""

from __future__ import annotations

from canadiannewsdatapipeline_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"


def _multiset(df):
    return sorted(tuple(r) for r in df.collect())


def test_format_roundtrips(spark, tmp_path):
    cu = load_table(spark, SF, "customer")
    want = _multiset(cu)
    schema = cu.schema

    for fmt in ("parquet", "orc", "json", "csv"):
        out = str(tmp_path / fmt)
        w = cu.write.format(fmt).mode("overwrite")
        if fmt == "csv":
            w = w.option("header", "true")
        w.save(out)
        r = spark.read.format(fmt).schema(schema)
        if fmt == "csv":
            r = r.option("header", "true")
        got = _multiset(r.load(out))
        # Java Double.toString is round-trip exact, so even the text
        # formats reproduce c_acctbal bit-for-bit
        assert got == want, f"{fmt} round-trip mismatch"


def test_parquet_merge_schema_evolution(spark, tmp_path):
    # schema evolution on disk: later files add a column; mergeSchema
    # unifies with NULL backfill for the old files
    d = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, v string").write.mode(
        "append"
    ).parquet(d)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, v string, score double"
    ).write.mode("append").parquet(d)
    got = spark.read.option("mergeSchema", "true").parquet(d)
    assert set(got.columns) == {"id", "v", "score"}
    rows = {(r.id, r.v, r.score) for r in got.collect()}
    assert rows == {(1, "a", None), (2, "b", 9.5)}


def test_corrupt_json_quarantine(spark, tmp_path):
    # PERMISSIVE ingestion: malformed lines land in the corrupt-record
    # column instead of failing the job — the quarantine pattern for
    # untrusted feeds (reference scrapes arbitrary remote HTML/JSON)
    p = tmp_path / "feed.jsonl"
    p.write_text('{"id": 1, "v": "ok"}\n{not json at all}\n{"id": 3, "v": "fine"}\n')
    df = (
        spark.read.schema("id long, v string, _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(p))
    )
    df = df.cache()  # required to observe _corrupt_record consistently
    good = df.filter(df._corrupt_record.isNull())
    bad = df.filter(df._corrupt_record.isNotNull())
    assert sorted(r.id for r in good.collect()) == [1, 3]
    assert bad.count() == 1 and "{not json" in bad.collect()[0]._corrupt_record
    df.unpersist()


def test_observe_metrics_piggyback(spark):
    # df.observe(): row-level quality counters collected as a side
    # effect of the ACTUAL job — no second scan for metrics
    import pyspark.sql.functions as F
    from pyspark.sql import Observation

    from canadiannewsdatapipeline_spark.sources.registry import load_table

    o = load_table(spark, "/root/testdata/sf0.001", "orders")
    obs = Observation("ingest_metrics")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double").alias("total"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("n_nonpositive"),
    )
    n_filtered = observed.filter(F.col("o_orderstatus") == "F").count()
    m = obs.get
    assert n_filtered > 0
    assert m["n_rows"] == o.count()  # metrics saw EVERY row pre-filter
    assert m["n_nonpositive"] == 0 and m["total"] > 0


def test_compact_small_files(spark, tmp_path):
    from canadiannewsdatapipeline_spark.sources.io import compact_small_files

    src = str(tmp_path / "many")
    dst = str(tmp_path / "few")
    spark.range(1000).repartition(20).write.parquet(src)
    import os

    assert len([f for f in os.listdir(src) if f.endswith(".parquet")]) == 20
    n = compact_small_files(spark, src, dst, target_files=2)
    assert n == 2
    assert spark.read.parquet(dst).count() == 1000
