"""Date-partitioned layout: a partition-key predicate must prune at
the directory level (PartitionFilters), not scan-and-filter."""

from __future__ import annotations

from pyspark.sql import functions as F

from canadiannewsdatapipeline_spark.sources.io import append_raw
from canadiannewsdatapipeline_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"


def test_partitioned_write_prunes(spark, tmp_path):
    orders = load_table(spark, SF, "orders").withColumn(
        "order_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    out = str(tmp_path / "orders_by_month")
    append_raw(orders, out, partition_by=["order_month"])

    back = spark.read.parquet(out)
    one_month = back.filter(F.col("order_month") == "1995-03")
    plan = one_month._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # the month predicate resolves against the directory layout...
    assert "PartitionFilters" in plan and "order_month" in plan.split("PartitionFilters", 1)[1].splitlines()[0]
    # ...and only that month's files are actually read
    files = [
        r["f"]
        for r in one_month.select(F.input_file_name().alias("f")).distinct().collect()
    ]
    assert files and all("order_month=1995-03" in f for f in files)
    # round-trip count matches a post-hoc filter on the source
    assert one_month.count() == orders.filter(
        F.col("order_month") == "1995-03"
    ).count()


def test_dynamic_partition_pruning(spark, tmp_path):
    """A join filter on the dim side must prune fact partitions at
    runtime (DPP): the fact scan carries a dynamicpruning subquery
    instead of reading every month."""
    from pyspark.sql import functions as F2

    orders = load_table(spark, SF, "orders").withColumn(
        "order_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    out = str(tmp_path / "orders_dpp")
    append_raw(orders, out, partition_by=["order_month"])

    fact = spark.read.parquet(out)
    # dim filtered on a NON-join column: a literal filter on the join
    # key itself would constraint-propagate into a static partition
    # filter (no DPP needed) — the runtime-subquery path only kicks in
    # when the pruning values are unknowable at plan time
    months = sorted(r.order_month for r in orders.select("order_month").distinct().collect())
    dim = spark.createDataFrame(
        [(m, m[5:7]) for m in months], "order_month string, month_no string"
    )
    joined = fact.join(dim.filter(F2.col("month_no") == "06"), "order_month")
    plan = joined._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # the fact scan declares a runtime pruning filter fed by the dim
    # (input_file_name() is unusable post-join, so the scan's declared
    # PartitionFilters is the pruning evidence)
    pf = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "dynamicpruningexpression" in pf
    want = orders.filter(F.col("order_month").substr(6, 2) == "06").count()
    assert want > 0 and joined.count() == want


def test_dynamic_partition_overwrite(spark, tmp_path):
    # incremental backfill contract: overwriting with one partition's
    # data must replace ONLY that partition, not truncate the table
    import pyspark.sql.functions as F

    target = str(tmp_path / "dpo")
    saved = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        base = spark.createDataFrame(
            [("2024-01-01", 1, 10.0), ("2024-01-01", 2, 20.0),
             ("2024-01-02", 3, 30.0)],
            "day string, id int, v double",
        )
        base.write.partitionBy("day").mode("overwrite").parquet(target)
        # re-run day 2 only, with corrected values
        fix = spark.createDataFrame(
            [("2024-01-02", 3, 99.0), ("2024-01-02", 4, 40.0)],
            "day string, id int, v double",
        )
        fix.write.partitionBy("day").mode("overwrite").parquet(target)
        # partition-column directory values type-infer to DATE on read
        got = {
            (str(r.day), r.id, r.v) for r in spark.read.parquet(target).collect()
        }
        assert got == {
            ("2024-01-01", 1, 10.0), ("2024-01-01", 2, 20.0),
            ("2024-01-02", 3, 99.0), ("2024-01-02", 4, 40.0),
        }
    finally:
        if saved is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", saved)
