"""Physical-plan regressions for the round-2 TPC-H completions and
SCD2/session-window families: the scale-survival properties (pushdown,
no pinned broadcasts on fact-proportional tables, decorrelation =>
no nested-loop recompute, single window exchange) asserted in explain
output."""

from __future__ import annotations

from canadiannewsdatapipeline_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _fresh_df(spark, name: str):
    # bypass the registry's plan cache: plan-shape assertions need a
    # fresh, never-executed DataFrame — a memoized one that an earlier
    # test already ran has a finalized AdaptiveSparkPlan, and explain
    # then prints BOTH the initial and final plans (doubling node
    # counts)
    fn = QUERIES[name].fn
    return getattr(fn, "__wrapped__", fn)(spark, SF)


def _formatted(spark, name: str) -> str:
    df = _fresh_df(spark, name)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_q14_pushdown_and_single_agg_exchange(spark):
    plan = _formatted(spark, "tpch_q14_promo_revenue")
    # the shipdate range reaches the parquet scan
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate" in plan
    # conditional numerator + denominator reduce in ONE aggregate
    assert plan.count("HashAggregate") <= 4  # partial+final, no extra pass


def test_q17_decorrelated_no_cartesian(spark):
    plan = _formatted(spark, "tpch_q17_small_qty_avg")
    # the correlated AVG is a per-key agg + equi-join, never a
    # nested-loop/cartesian recompute
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q15_max_is_broadcast_not_window(spark):
    plan = _formatted(spark, "tpch_q15_top_supplier")
    # global-max selection must not be a single-partition window
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_q22_anti_join_shape(spark):
    plan = _formatted(spark, "tpch_q22_idle_customers")
    assert "LeftAnti" in plan
    # orders scan prunes to the single join column
    read = [l for l in plan.splitlines() if "ReadSchema" in l and "o_custkey" in l]
    assert read and all("o_totalprice" not in l for l in read)


def test_q21_semi_and_anti(spark):
    plan = _formatted(spark, "tpch_q21_waiting_supplier")
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_q7_no_pinned_broadcast_on_facts(spark):
    # nation broadcasts are pinned; customer/supplier/orders must not
    # be forced (AQE decides at runtime)
    from canadiannewsdatapipeline_spark.queries.tpch2 import tpch_q7_volume_shipping
    import inspect

    src = inspect.getsource(tpch_q7_volume_shipping)
    assert "broadcast(n1" in src and "broadcast(n2" in src
    assert "broadcast(c" not in src and "broadcast(s" not in src and "broadcast(o" not in src


def _node_count(plan: str, node: str) -> int:
    import re

    return len(re.findall(rf"^\(\d+\) {node}\b", plan, re.M))


def test_scd2_single_window_exchange(spark):
    plan = _formatted(spark, "scd2_user_history")
    # lead + row_number + is_current share one hash exchange on user_id
    assert _node_count(plan, "Exchange") == 1
    assert _node_count(plan, "Window") == 1


def test_session_window_native_plan(spark):
    plan = _formatted(spark, "events_session_window_native")
    # session windows sort within the user_id exchange; no extra shuffle
    assert _node_count(plan, "Exchange") <= 2


def test_range_bin_is_broadcast_nested_loop(spark):
    plan = _formatted(spark, "j_range_bin_join")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_bigram_scoring_no_python(spark):
    plan = _formatted(spark, "text_bigram_logprob")
    assert "Python" not in plan  # pure codegen train + score


def test_interpolate_single_exchange(spark):
    plan = _formatted(spark, "a_linear_interpolate")
    # both IGNORE NULLS directions share the user_id exchange
    assert _node_count(plan, "Exchange") == 1


def test_join_strategy_hints_respected(spark):
    # the engine exposes all three join strategies via hints — the
    # escape hatch when AQE's choice is wrong for a known workload
    import pyspark.sql.functions as F

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    merge = li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
    assert "SortMergeJoin" in merge._jdf.queryExecution().executedPlan().toString()
    shuffle_hash = li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
    assert "ShuffledHashJoin" in shuffle_hash._jdf.queryExecution().executedPlan().toString()
    bcast = li.join(o.hint("broadcast"), li.l_orderkey == o.o_orderkey)
    assert "BroadcastHashJoin" in bcast._jdf.queryExecution().executedPlan().toString()


def test_global_sort_uses_range_partitioning(spark):
    # a total-order write must plan as sampled RangePartitioning (every
    # partition a contiguous key range, parallel sort) — never a
    # single-partition sort
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    plan = (
        li.orderBy("l_shipdate", "l_orderkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" in plan.lower()
    assert "SinglePartition" not in plan
