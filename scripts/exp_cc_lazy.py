"""A/B: (1) connected-components loop with lazy localCheckpoint —
the label-sum action materializes the checkpoint, halving jobs per
iteration; (2) news_quality_checks with persisted tr/marts."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from ab_bench import check_same_rows
from canadiannewsdatapipeline_spark.session import get_spark
from canadiannewsdatapipeline_spark.sources.registry import load_table
from canadiannewsdatapipeline_spark.operators.cluster import (
    _label_sum,
    connected_components,
)
from canadiannewsdatapipeline_spark.operators.dedup import lsh_verified_pairs
from canadiannewsdatapipeline_spark.queries import QUERIES

SF = "/root/testdata/sf0.1"
spark = get_spark("exp-cc-news")
spark.range(1_000_000).selectExpr("sum(id)").collect()


def cc_lazy(nodes: DataFrame, pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    e = pairs.select(
        F.col("id_a").cast("long").alias("src"), F.col("id_b").cast("long").alias("dst")
    )
    edges = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    lab = nodes.select(
        F.col("id").cast("long").alias("id"), F.col("id").cast("long").alias("lab")
    )
    lab = lab.localCheckpoint(eager=False)
    prev = _label_sum(lab)
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
        cur = _label_sum(lab)
        if cur == prev:
            break
        prev = cur
    return lab


docs = load_table(spark, SF, "documents")
pairs = lsh_verified_pairs(
    docs, "text", "doc_id", num_hashes=12, rows_per_band=3, threshold=0.5
)
nodes = docs.select(F.col("doc_id").alias("id"))

for i in range(3):
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    old_cc = connected_components(nodes, pairs)
    t_old = time.perf_counter() - t0
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    new_cc = cc_lazy(nodes, pairs)
    t_new = time.perf_counter() - t0
    if i == 0:
        check_same_rows(old_cc, new_cc)
        print("CC PARITY OK", flush=True)
    print(f"cc build: old {t_old:.3f} new {t_new:.3f} ratio {t_old / t_new:.2f}x",
          flush=True)

# ---- news_quality_checks ----
from canadiannewsdatapipeline_spark.queries.news import (  # noqa: E402
    _transformed,
    _sentiment,
    articles_mart,
    authors_mart,
    bridge_mart,
)
from canadiannewsdatapipeline_spark.operators.quality import (  # noqa: E402
    checks_summary,
    not_null_violations,
    relationship_violations,
    unique_violations,
)


def new_quality(spark, sf_dir):
    tr = _transformed(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    art = articles_mart(tr).persist(StorageLevel.MEMORY_AND_DISK)
    auth = authors_mart(tr).persist(StorageLevel.MEMORY_AND_DISK)
    bridge = bridge_mart(tr)
    sent = _sentiment(tr).select("article_id")
    orphans = tr.sparkSession.createDataFrame(
        [("orphan-1",), ("orphan-2",)], "seed string"
    ).select(F.md5("seed").alias("article_id"))
    sent_with_orphans = sent.unionByName(orphans)
    return checks_summary(
        [
            ("articles_article_id_unique", unique_violations(art, ["article_id"])),
            ("articles_article_id_not_null", not_null_violations(art, "article_id")),
            ("bridge_article_fk",
             relationship_violations(bridge, "article_id", art, "article_id")),
            ("bridge_author_fk",
             relationship_violations(bridge, "author_id", auth, "author_id")),
            ("sentiment_article_fk",
             relationship_violations(sent_with_orphans, "article_id", art, "article_id")),
            ("authors_natural_key_unique",
             unique_violations(auth, ["first_name", "last_name", "author_url",
                                      "author_email"])),
        ]
    )


old_q = QUERIES["news_quality_checks"].fn.__wrapped__(spark, SF)
new_q = new_quality(spark, SF)
spark.catalog.clearCache()
check_same_rows(old_q, new_q)
print("NEWS PARITY OK", flush=True)
ts_old, ts_new = [], []
spark.catalog.clearCache()
old_q.write.format("noop").mode("overwrite").save()
spark.catalog.clearCache()
new_q.write.format("noop").mode("overwrite").save()
for i in range(4):
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    old_q.write.format("noop").mode("overwrite").save()
    ts_old.append(time.perf_counter() - t0)
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    new_q.write.format("noop").mode("overwrite").save()
    ts_new.append(time.perf_counter() - t0)
print("news_quality_checks old", [round(t, 3) for t in ts_old],
      "new", [round(t, 3) for t in ts_new],
      f"ratio(min) {min(ts_old) / min(ts_new):.2f}x")
spark.stop()
