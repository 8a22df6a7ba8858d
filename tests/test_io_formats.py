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
