"""Prototype + interleaved A/B: distributed sort-rank exact percentile
vs Spark's built-in `percentile` aggregate (single-reducer-per-group
count-map) on a_mad_robust's shape at sf0.1.

The rank form: range-repartition (grp, val) -> sortWithinPartitions ->
stamp monotonically_increasing_id (pid * 2^33 + local position) ->
persist; ONE tiny collect of per-(pid, grp) counts locates the global
k-th element addresses; a map-side mid.isin(targets) filter picks the
<= 2 rows per (group, p) with NO further shuffle and NO per-group
serial sort. Interpolation replicates Spark's exact arithmetic
(lower*(1-d) + upper*d with d = p*(n-1) - floor(p*(n-1)) — the formula
was pinned empirically: 4000-case adversarial fuzz matched it
exclusively, 0 mismatches, vs 1039 mismatches for lower+(upper-lower)*d).

r13 verdict (OPTIMIZATION_r13.md, SCALE.md §Round-13): REJECTED for
the tree. Parity is bit-exact everywhere measured — 9 lineitem cells
and a 192-cell adversarial fuzz (group sizes 1/2/3/4/5/7/100/101,
heavy duplicates, NaN) — so the rewrite is CORRECT, but the
interleaved A/B on the full a_mad_robust shape reads 0.66x (builtin
min 2.72 s vs rank 4.13 s): two persists + four jobs + two driver
round-trips of fixed cost against a builtin whose serial per-group
merge only costs ~0.8 s at sf0.1's 583k distinct values. The rank
form is the right shape only where the per-group value state
approaches executor memory; at that scale the sanctioned path in this
tree is the deterministic hash-sample percentile
(sketch_hash_sample_quantiles), and the exact-percentile contract's
serial bound stays documented instead of paying 1.5x locally.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from canadiannewsdatapipeline_spark.session import get_spark
from canadiannewsdatapipeline_spark.sources.registry import load_table

SF = "/root/testdata/sf0.1"


def rank_percentiles(spark, df, grp, val, ps):
    """(grp, p, pctl) exact percentiles via distributed selection."""
    from pyspark.storagelevel import StorageLevel

    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    s = (
        df.select(F.col(grp).alias("g"), F.col(val).cast("double").alias("v"))
        .filter(F.col("v").isNotNull())
        .repartitionByRange(n_part, "g", "v")
        .sortWithinPartitions("g", "v")
        .select(
            "g", "v",
            F.spark_partition_id().alias("pid"),
            F.monotonically_increasing_id().alias("mid"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # one tiny job: per-(pid, g) counts (materializes the persist too)
    pc = s.groupBy("pid", "g").agg(
        F.count(F.lit(1)).alias("c"), F.min("mid").alias("mid0")
    ).collect()
    # driver-side: cumulative offsets in (g, pid) order -> target mids
    by_g: dict = {}
    for r in sorted(pc, key=lambda r: (str(r["g"]), r["pid"])):
        by_g.setdefault(r["g"], []).append((r["pid"], r["c"], r["mid0"]))
    targets = {}  # mid -> list of (g, p, role)
    meta = []  # (g, p, n, frac, single)
    for g, chunks in by_g.items():
        n = sum(c for _, c, _ in chunks)
        for p in ps:
            pos = p * (n - 1)
            lo = int(pos)  # floor for pos >= 0
            frac = pos - lo
            ranks = [lo] if frac == 0.0 else [lo, lo + 1]  # 0-based
            meta.append((g, p, n, frac, frac == 0.0))
            for role, rk in zip(("lo", "hi"), ranks):
                cum = 0
                for pid, c, mid0 in chunks:
                    if rk < cum + c:
                        targets.setdefault(mid0 + (rk - cum), []).append(
                            (g, p, role)
                        )
                        break
                    cum += c
    picked = {
        r["mid"]: r["v"]
        for r in s.filter(F.col("mid").isin(list(targets))).collect()
    }
    out = []
    for g, p, n, frac, single in meta:
        lo_v = hi_v = None
        for mid, roles in targets.items():
            for g2, p2, role in roles:
                if g2 == g and p2 == p:
                    if role == "lo":
                        lo_v = picked[mid]
                    else:
                        hi_v = picked[mid]
        if single:
            out.append((g, p, lo_v))
        else:
            # Spark Percentile's exact arithmetic (python doubles are
            # IEEE-identical to JVM doubles for *, +)
            out.append((g, p, lo_v * (1.0 - frac) + hi_v * frac))
    return out


def main():
    spark = get_spark("exp-pctl-rank")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    li = load_table(spark, SF, "lineitem")

    # ---- parity: builtin vs rank form on the real column ----
    builtin = {
        (r["l_returnflag"], p): r[f"p{i}"]
        for r in li.groupBy("l_returnflag")
        .agg(
            *[
                F.expr(f"percentile(l_extendedprice, {p}D)").alias(f"p{i}")
                for i, p in enumerate((0.5, 0.9, 0.99))
            ]
        )
        .collect()
        for i, p in enumerate((0.5, 0.9, 0.99))
    }
    got = {
        (g, p): v
        for g, p, v in rank_percentiles(
            spark, li, "l_returnflag", "l_extendedprice", [0.5, 0.9, 0.99]
        )
    }
    assert set(got) == set(builtin)
    bad = {k: (got[k], builtin[k]) for k in got if got[k] != builtin[k]}
    assert not bad, f"parity FAILED: {bad}"
    print(f"lineitem parity OK ({len(got)} group x p cells, bit-exact)", flush=True)

    # ---- parity fuzz: adversarial group shapes ----
    import random

    rng = random.Random(29)
    rows = []
    gid = 0
    for size in (1, 2, 3, 4, 5, 7, 100, 101):
        for rep in range(8):
            gid += 1
            vals = [rng.uniform(-1e6, 1e6) for _ in range(size)]
            if rep % 3 == 1:
                vals = [round(v, -2) for v in vals]  # heavy duplicates
            if rep % 4 == 2 and size > 2:
                vals[0] = float("nan")  # NaN sorts greatest in Spark
            rows += [(gid, v) for v in vals]
    fuzz = spark.createDataFrame(rows, "g int, v double").persist()
    fuzz.count()
    fb = {
        (r["g"], p): r[f"p{i}"]
        for r in fuzz.groupBy("g")
        .agg(
            *[
                F.expr(f"percentile(v, {p}D)").alias(f"p{i}")
                for i, p in enumerate((0.25, 0.5, 0.9))
            ]
        )
        .collect()
        for i, p in enumerate((0.25, 0.5, 0.9))
    }
    fg = {
        (g, p): v
        for g, p, v in rank_percentiles(spark, fuzz, "g", "v", [0.25, 0.5, 0.9])
    }

    def same(a, b):
        return (a != a and b != b) or a == b  # NaN-aware exact

    bad = {k: (fg.get(k), fb[k]) for k in fb if not same(fg.get(k), fb[k])}
    assert not bad, f"fuzz parity FAILED ({len(bad)}): {list(bad.items())[:5]}"
    print(f"fuzz parity OK ({len(fb)} cells: sizes 1-101, dups, NaN)", flush=True)

    # ---- interleaved wall A/B on the a_mad_robust shape ----
    def mad_builtin():
        med = li.groupBy(F.col("l_returnflag").alias("m_flag")).agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("med")
        )
        dev = li.join(
            F.broadcast(med), F.col("m_flag") == F.col("l_returnflag")
        ).select(
            "l_returnflag", "med",
            F.abs(F.col("l_extendedprice") - F.col("med")).alias("adev"),
        )
        out = dev.groupBy("l_returnflag").agg(
            F.round(F.first("med"), 6).alias("median_price"),
            F.round(F.expr("percentile(adev, 0.5)"), 6).alias("mad"),
        )
        out.write.format("noop").mode("overwrite").save()

    def mad_rank():
        meds = rank_percentiles(
            spark, li, "l_returnflag", "l_extendedprice", [0.5]
        )
        med = spark.createDataFrame(
            [(g, v) for g, _, v in meds], "m_flag string, med double"
        )
        dev = li.join(
            F.broadcast(med), F.col("m_flag") == F.col("l_returnflag")
        ).select(
            "l_returnflag", "med",
            F.abs(F.col("l_extendedprice") - F.col("med")).alias("adev"),
        )
        mads = rank_percentiles(spark, dev, "l_returnflag", "adev", [0.5])
        madf = spark.createDataFrame(
            [(g, v) for g, _, v in mads], "l_returnflag string, mad_raw double"
        )
        out = med.join(
            madf, F.col("m_flag") == F.col("l_returnflag")
        ).select(
            "l_returnflag",
            F.round("med", 6).alias("median_price"),
            F.round("mad_raw", 6).alias("mad"),
        )
        out.write.format("noop").mode("overwrite").save()

    mad_builtin(); mad_rank()  # warm
    t_b, t_r = [], []
    for i in range(4):
        spark.catalog.clearCache()
        t0 = time.perf_counter(); mad_builtin(); t_b.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
        t0 = time.perf_counter(); mad_rank(); t_r.append(time.perf_counter() - t0)
    r3 = lambda xs: [round(t, 3) for t in xs]  # noqa: E731
    print(
        f"a_mad_robust shape: builtin {r3(t_b)} | rank {r3(t_r)} | "
        f"ratio(min) {min(t_b) / min(t_r):.2f}x",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
