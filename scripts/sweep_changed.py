import json
import os
import sys

names = [
    "dedup_embedding_cosine", "sim_ann_lsh", "sim_ann_ivf",
    "dedup_exact_substring", "dedup_simhash", "sketch_cms_wordcounts",
    "sim_topk_cosine",
]
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
from canadiannewsdatapipeline_spark.queries import QUERIES
from canadiannewsdatapipeline_spark.session import get_spark

spark = get_spark("sweep-changed")
spark.range(1_000_000).selectExpr("sum(id)").collect()
SF = "/root/testdata/sf0.1"
out = {}
for name in names:
    spark.sparkContext._jvm.System.gc()
    t0 = time.perf_counter()
    df = QUERIES[name].fn(spark, SF)
    plan_s = time.perf_counter() - t0
    df.write.format("noop").mode("overwrite").save()
    trials = []
    for _ in range(2):
        t1 = time.perf_counter()
        QUERIES[name].fn(spark, SF).write.format("noop").mode("overwrite").save()
        trials.append(time.perf_counter() - t1)
    out[name] = {"min": round(min(trials), 3), "plan": round(plan_s, 3)}
    print(name, out[name], flush=True)
with open("/tmp/sweep_changed_after.json", "w") as fh:
    json.dump(out, fh)
spark.stop()
