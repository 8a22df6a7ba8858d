"""Cold interleaved A/B of the r12 spread changes, query-level.

Old arm: plans built with spread monkeypatched to identity (the
pre-change shapes, persists unchanged). New arm: the committed tree.
Cache cleared inside every timed trial so persists pay their build.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ab_bench import check_same_rows
from canadiannewsdatapipeline_spark.session import get_spark
from canadiannewsdatapipeline_spark.operators import dedup, similarity, spread as spread_mod
from canadiannewsdatapipeline_spark.queries import QUERIES

SF = "/root/testdata/sf0.1"
NAMES = [
    "dedup_minhash_lsh",
    "dedup_lsh_verified",
    "dedup_simhash",
    "dedup_minhash_estimate",
    "dedup_exact_substring",
    "sketch_cms_wordcounts",
    "sim_topk_cosine",
    "dedup_embedding_cosine",
    "sim_ann_lsh",
    "sim_ann_ivf",
]

spark = get_spark("exp-spread4")
spark.range(1_000_000).selectExpr("sum(id)").collect()

_ident = lambda df, *by: df  # noqa: E731
_real = spread_mod.spread


def set_spread(fn):
    spread_mod.spread = fn
    dedup.spread = fn
    similarity.spread = fn


pairs = {}
for name in NAMES:
    set_spread(_ident)
    old = QUERIES[name].fn.__wrapped__(spark, SF)
    set_spread(_real)
    new = QUERIES[name].fn.__wrapped__(spark, SF)
    pairs[name] = (old, new)

for name, (old, new) in pairs.items():
    spark.catalog.clearCache()
    check_same_rows(old, new)
    print(f"{name}: PARITY OK", flush=True)

for name, (old, new) in pairs.items():
    spark.catalog.clearCache()
    old.write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    new.write.format("noop").mode("overwrite").save()
    ts_old, ts_new = [], []
    for i in range(3):
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"{name} old {i}")
        t0 = time.perf_counter()
        old.write.format("noop").mode("overwrite").save()
        ts_old.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"{name} new {i}")
        t0 = time.perf_counter()
        new.write.format("noop").mode("overwrite").save()
        ts_new.append(time.perf_counter() - t0)
    print(
        f"{name}: old {[round(t, 3) for t in ts_old]} | "
        f"new {[round(t, 3) for t in ts_new]} | "
        f"ratio(min) {min(ts_old) / min(ts_new):.2f}x",
        flush=True,
    )
spark.stop()
