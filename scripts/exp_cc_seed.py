"""Interleaved A/B of the r13 connected-components changes on the two
real consumers (dedup_clusters, corpus_quality_filter) at sf0.1.

Old arm: the r12 loop (inlined below verbatim from git 14a2d3e) —
lab=id start, first-round combined sum(id)/sum(lab) aggregate,
sum-compare convergence. New arm: the committed tree — seeded start
(lab0 = min(id, min neighbour) straight off the edge groupBy, no
edges-to-labels join in the seed step) + changed-count convergence.

The cc fixpoint executes INSIDE the query fn() (each round is a
collect), so the timed quantity is the full fn build + one noop run,
caches cleared between trials (the same cold methodology as
scripts/exp_spread_cold_ab.py).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from ab_bench import check_same_rows
from canadiannewsdatapipeline_spark.operators import cluster as cluster_mod
from canadiannewsdatapipeline_spark.queries import QUERIES
from canadiannewsdatapipeline_spark.session import get_spark

SF = "/root/testdata/sf0.1"
NAMES = ["dedup_clusters", "corpus_quality_filter"]


def old_connected_components(nodes, pairs, max_iter=25):
    e = pairs.select(
        F.col("id_a").cast("long").alias("src"), F.col("id_b").cast("long").alias("dst")
    )
    edges = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)
    lab = nodes.select(
        F.col("id").cast("long").alias("id"), F.col("id").cast("long").alias("lab")
    )
    prev = None
    for _ in range(max_iter):
        nbr = (
            edges.join(lab.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.min("lab").alias("nmin"))
        )
        prop = lab.join(nbr, "id", "left").select(
            "id", F.least("lab", F.coalesce("nmin", F.col("lab"))).alias("lab")
        )
        hop = prop.select(F.col("id").alias("lab"), F.col("lab").alias("lab2"))
        lab = (
            prop.join(hop, "lab")
            .select("id", F.col("lab2").alias("lab"))
            .localCheckpoint(eager=False)
        )
        if prev is None:
            row = lab.agg(
                F.sum(F.col("id").cast("decimal(38,0)")),
                F.sum(F.col("lab").cast("decimal(38,0)")),
            ).collect()[0]
            prev, cur = int(row[0]), int(row[1])
        else:
            cur = int(
                lab.agg(F.sum(F.col("lab").cast("decimal(38,0)"))).collect()[0][0]
            )
        if cur == prev:
            break
        prev = cur
    return lab


def main():
    spark = get_spark("exp-cc-seed")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    new_cc = cluster_mod.connected_components

    def build(name, arm):
        cluster_mod.connected_components = (
            old_connected_components if arm == "old" else new_cc
        )
        try:
            return QUERIES[name].fn.__wrapped__(spark, SF)
        finally:
            cluster_mod.connected_components = new_cc

    for name in NAMES:
        spark.catalog.clearCache()
        check_same_rows(build(name, "old"), build(name, "new"))
        print(f"{name}: PARITY OK", flush=True)

    for name in NAMES:
        t_old, t_new = [], []
        # warmup one build per arm (JVM/codegen/page cache)
        for arm in ("old", "new"):
            spark.catalog.clearCache()
            build(name, arm).write.format("noop").mode("overwrite").save()
        for i in range(4):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name} cc old {i}")
            t0 = time.perf_counter()
            build(name, "old").write.format("noop").mode("overwrite").save()
            t_old.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name} cc new {i}")
            t0 = time.perf_counter()
            build(name, "new").write.format("noop").mode("overwrite").save()
            t_new.append(time.perf_counter() - t0)
        r3 = lambda xs: [round(t, 3) for t in xs]  # noqa: E731
        print(
            f"{name}: old {r3(t_old)} | new {r3(t_new)} | "
            f"ratio(min) {min(t_old) / min(t_new):.2f}x",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
