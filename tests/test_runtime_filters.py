"""Runtime filter (bloom-filter semi-join reduction) regression.

At 100 TB the single biggest scan saver after static pushdown is the
runtime bloom filter: a selective dimension filter is aggregated into
a bloom filter and pushed into the fact scan BEFORE the shuffle join,
so the exchange moves only probably-matching rows. The production
session keeps Spark's default thresholds (creation side < 10 MB,
application scan > 10 GB — i.e. it arms automatically exactly in the
big-fact/selective-dim regime); this test lowers the application-side
threshold so the sf0.001 warehouse crosses it and asserts injection
actually happens on our join shapes.
"""

from __future__ import annotations

import pyspark.sql.functions as F


def test_bloom_filter_injected_on_selective_dim_join(spark):
    keys = (
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )
    saved = {k: spark.conf.get(k, None) for k in keys}
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "1KB",
        )
        # force a shuffle join: bloom filters only arm on non-broadcast joins
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
        o = spark.read.parquet("/root/testdata/sf0.01/orders.parquet").filter(
            F.col("o_totalprice") > 400000
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey)
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan
        # the runtime filter probes the FACT side scan
        n = len(j.collect())
        assert n > 0
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bloom_filter_off_when_dim_broadcasts(spark):
    # with broadcast enabled the join plans as BHJ and no bloom filter
    # is needed (the hash table itself prunes) — assert we don't pay
    # for a redundant one
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").filter(
        F.col("o_totalprice") > 400000
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    plan = j._jdf.queryExecution().optimizedPlan().toString()
    assert "bloom_filter_agg" not in plan
