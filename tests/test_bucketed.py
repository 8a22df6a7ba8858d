"""Bucketed-table co-located join: the write shuffles once, every
downstream join on the bucket key must be exchange-free."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from canadiannewsdatapipeline_spark.sources.bucketed import read_bucketed, write_bucketed
from canadiannewsdatapipeline_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def no_broadcast(spark):
    """Force the join planner away from broadcast so the test exercises
    the big-big (SortMergeJoin) path the bucketing exists for."""
    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )
    old = {k: spark.conf.get(k, None) for k in keys}
    for k in keys:
        spark.conf.set(k, "-1")
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_bucketed_join_no_exchange(spark, tmp_path, no_broadcast):
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    od = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    write_bucketed(li, "b_lineitem", ["l_orderkey"], 8, str(tmp_path / "li"))
    write_bucketed(od, "b_orders", ["o_orderkey"], 8, str(tmp_path / "od"))
    try:
        j = read_bucketed(spark, "b_lineitem").join(
            read_bucketed(spark, "b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # co-located scan
        # and the answer matches the plain (shuffling) join
        assert j.count() == li.join(od, li.l_orderkey == od.o_orderkey).count()

        # aggregation on the bucket key is exchange-free too
        agg = (
            read_bucketed(spark, "b_lineitem")
            .groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("q"))
        )
        aplan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in aplan
    finally:
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")
