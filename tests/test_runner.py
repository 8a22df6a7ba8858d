"""ModelRunner: topological order, materialization, write-audit-skip."""

from __future__ import annotations

from pyspark.sql import functions as F

from canadiannewsdatapipeline_spark.plans.runner import Model, ModelRunner


def test_runner_topo_order_and_materialization(spark, tmp_path):
    models = [
        Model("mart", lambda t: t.groupBy("k").count(), deps=["trans"],
              materialized="table"),
        Model("trans", lambda s: s.withColumn("k", F.col("x") % 2), deps=["stg"]),
        Model("stg", lambda raw: raw.select(F.col("v").alias("x")), deps=["raw"]),
    ]
    runner = ModelRunner(spark, models, warehouse_dir=str(tmp_path))
    assert runner.order() == ["stg", "trans", "mart"]

    raw = spark.createDataFrame([(i,) for i in range(10)], "v long")
    out = runner.run({"raw": raw})
    assert {r.k: r["count"] for r in out["mart"].collect()} == {0: 5, 1: 5}
    # mart was materialized to parquet
    assert (tmp_path / "mart").exists()

    # write-audit-publish: skip_existing reuses the materialized table
    out2 = runner.run({"raw": raw.limit(0)}, skip_existing=True)
    assert out2["mart"].count() == 2
