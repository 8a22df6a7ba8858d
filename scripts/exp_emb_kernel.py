"""Interleaved A/B: emb_project_matmul fold-literal shape (the
SHIPPED implementation, inlined below as `old_project`) vs an Arrow
mapInArrow fold kernel (`new_project`, inlined — measured, REJECTED,
not in the tree). Measures plan-construction time (the motivating
cost: the analyzer walking 512 plan literals) and execution wall
separately, plus an exact old-vs-new parity check on sf0.1 AND on an
adversarial in-memory frame (NULL vector / NULL element / short /
long / NaN / Inf rows) that no committed warehouse contains.

r13 verdict (see OPTIMIZATION_r13.md): the kernel wins plan build
2.5-3.7x across sessions (0.27-0.64 s -> 0.09-0.25 s) but LOSES execution wall at
every scale — 0.22x at sf0.1's 200 rows (Python-worker fixed cost)
and 0.59x at 1M synthetic rows (Arrow transfer of 64 doubles/row both
ways beats nothing: the JVM fold is whole-stage codegen with zero
boundary). A third arm (broadcast 8-row weights TABLE, fold stays
JVM, one lambda tree in the plan) won plan build (0.081 s) but lost
wall worst of all (0.69x at 1M: the fold re-evaluates per exploded
output row behind a BNLJ). The r12 closing-audit figure that
motivated the port (0.91 s plan) did not replicate under interleaved
measurement. Decision: keep the zero-Python fold-literal shape
(guide §1.2 — the distributed algorithm/per-task work outranks a
constant per-build analyzer cost; §4.1 — never add a JVM<->Python
boundary to save plan time).
"""
import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from canadiannewsdatapipeline_spark.queries.llm import _PROJ_OUT
from canadiannewsdatapipeline_spark.session import get_spark
from canadiannewsdatapipeline_spark.sources.registry import load_table

SF = "/root/testdata/sf0.1"


def old_impl(spark, sf_dir):
    """The SHIPPED fold shape (mirrors queries/llm.py::emb_project_matmul)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 10 == 0)
    return old_project(emb)


def new_impl(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 10 == 0)
    return new_project(emb)


def old_project(emb):
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))

    def w_col(j):
        vals = [
            (hashlib.md5(f"{i}x{j}".encode()).hexdigest()[0].encode()[0] % 7) - 3
            for i in range(64)
        ]
        return F.expr("array(" + ",".join(f"{float(v)!r}D" for v in vals) + ")")

    outs = F.array(
        *[
            F.round(
                F.aggregate(
                    F.zip_with(e, w_col(j), lambda x, y: x * y),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            )
            + F.lit(0.0)
            for j in range(_PROJ_OUT)
        ]
    )
    return emb.select("vec_id", F.posexplode(outs).alias("j", "out_val")).withColumn(
        "j", F.col("j").cast("int")
    )


def project_fold_kernel(df, id_col, vec_col, weights):
    """The rejected mapInArrow kernel, kept here as the measured
    artifact. Parity-safe by construction: sequential i-ascending
    accumulation (one multiply + one add per lane per step — the
    Catalyst fold's exact op order, NOT a pairwise/SIMD matmul);
    rounding stays JVM-side in the caller; NULL detection is JVM-side
    (`bad` flag) because Arrow<->pandas conflates float NULL and NaN
    in both directions, and the output batch is built with
    from_pandas=False so a genuine NaN result survives as NaN."""
    import numpy as np
    import pyarrow as pa

    W = np.array(weights, dtype=np.float64).T  # (dim, n_out)
    dim, n_out = W.shape
    src = df.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
        (
            F.col(vec_col).isNull()
            | (F.size(vec_col) != F.lit(dim))
            | F.exists(vec_col, lambda x: x.isNull())
        ).alias("bad"),
    )
    out_schema = pa.schema(
        [("id", pa.int64()), ("j", pa.int32()), ("raw", pa.float64())]
    )

    def run(batches):
        for rb in batches:
            if rb.num_rows == 0:
                continue
            pdf = rb.to_pandas()  # input nulls are covered by `bad`
            ids = pdf["id"].to_numpy()
            bad = pdf["bad"].to_numpy()
            good = ~bad
            j_tile = np.arange(n_out, dtype=np.int32)
            if good.any():
                v = np.stack(pdf["v"][good].to_numpy()).astype(np.float64)
                acc = np.zeros((v.shape[0], n_out), dtype=np.float64)
                for i in range(dim):
                    acc = acc + v[:, i : i + 1] * W[i]
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(np.repeat(ids[good], n_out), from_pandas=False),
                        pa.array(np.tile(j_tile, int(good.sum())), from_pandas=False),
                        pa.array(acc.ravel(), from_pandas=False),
                    ],
                    schema=out_schema,
                )
            if bad.any():
                nb = int(bad.sum())
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(np.repeat(ids[bad], n_out), from_pandas=False),
                        pa.array(np.tile(j_tile, nb), from_pandas=False),
                        pa.nulls(nb * n_out, pa.float64()),
                    ],
                    schema=out_schema,
                )

    return src.mapInArrow(run, "id long, j int, raw double")


def new_project(emb):
    weights = [
        [
            float(
                (hashlib.md5(f"{i}x{j}".encode()).hexdigest()[0].encode()[0] % 7) - 3
            )
            for i in range(64)
        ]
        for j in range(_PROJ_OUT)
    ]
    proj = project_fold_kernel(emb, "vec_id", "embedding", weights)
    return proj.select(
        F.col("id").alias("vec_id"),
        "j",
        (F.round(F.col("raw"), 6) + F.lit(0.0)).alias("out_val"),
    )


def canon(rows):
    def c(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return f"{v:.17g}"
        return str(v)

    return sorted(tuple(c(v) for v in r) for r in rows)


def main():
    spark = get_spark("exp-emb-kernel")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # ---- parity on the real warehouse (exact, 17-sig-digit canon) ----
    a = canon(old_impl(spark, SF).collect())
    b = canon(new_impl(spark, SF).collect())
    assert a == b, "sf0.1 parity FAILED"
    print(f"sf0.1 parity OK ({len(a)} rows)", flush=True)

    # ---- adversarial parity (degenerate rows) ----
    import numpy as np

    rng = np.random.default_rng(13)
    clean = [
        [float(x) for x in rng.normal(size=64).astype(np.float32)] for _ in range(5)
    ]
    nan_vec = list(clean[0])
    nan_vec[11] = float("nan")
    inf_vec = list(clean[1])
    inf_vec[5] = float("inf")
    null_elem = list(clean[2])
    null_elem[7] = None
    rows = [
        (0, clean[0]),
        (10, clean[1]),
        (20, nan_vec),
        (30, inf_vec),
        (40, null_elem),
        (50, None),  # NULL vector
        (60, clean[3][:32]),  # short
        (70, clean[4] + clean[4][:8]),  # long
        (80, [0.0] * 64),  # zero vector
        (7, clean[0]),  # filtered out by vec_id % 10
    ]
    adv = spark.createDataFrame(rows, "vec_id long, embedding array<float>").filter(
        F.col("vec_id") % 10 == 0
    )
    a = canon(old_project(adv).collect())
    b = canon(new_project(adv).collect())
    if a != b:
        for x, y in zip(a, b):
            if x != y:
                print("  DIFF", x, "vs", y)
        raise SystemExit("adversarial parity FAILED")
    print(f"adversarial parity OK ({len(a)} rows incl NULL/NaN/Inf/len!=64)", flush=True)

    # ---- interleaved plan-construction + wall A/B ----
    # warm both code paths once
    old_impl(spark, SF).write.format("noop").mode("overwrite").save()
    new_impl(spark, SF).write.format("noop").mode("overwrite").save()
    plan_old, plan_new, wall_old, wall_new = [], [], [], []
    for i in range(5):
        spark.sparkContext.setJobDescription(f"emb kernel A/B old {i}")
        t0 = time.perf_counter()
        df = old_impl(spark, SF)
        df.schema  # force analysis like the registry wrapper does
        plan_old.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        wall_old.append(time.perf_counter() - t0)

        spark.sparkContext.setJobDescription(f"emb kernel A/B new {i}")
        t0 = time.perf_counter()
        df = new_impl(spark, SF)
        df.schema
        plan_new.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        wall_new.append(time.perf_counter() - t0)
    r3 = lambda xs: [round(t, 3) for t in xs]  # noqa: E731
    print(f"plan old {r3(plan_old)} | new {r3(plan_new)} | "
          f"ratio(min) {min(plan_old)/min(plan_new):.2f}x", flush=True)
    print(f"wall old {r3(wall_old)} | new {r3(wall_new)} | "
          f"ratio(min) {min(wall_old)/min(wall_new):.2f}x", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
