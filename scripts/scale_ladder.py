"""Scale-ladder bench: replicate the sf0.1 warehouse K-fold (with
consistent key offsets, so join integrity and key cardinality scale
together) and time the headline queries at each rung.

Why this exists: the driver's sf0.1 parquet is one row group per
table, so scan parallelism is 1 by data layout, and per-query wall is
dominated by fixed overhead — the bench alone can't distinguish "fast
because small" from "scales because the plans are right". The ladder
writes multi-row-group files (100k rows/group, the shape real
warehouses have), so scans actually fan out across cores and the
shuffle/agg plans are exercised at 10x the rows. Near-flat
wall-per-row across rungs is the evidence the 100 TB posture claims.

Replication scheme (copy i of K):
- every synthetic key gets +i*stride for its table (orderkey stride
  covers lineitem's FK, custkey covers orders', etc.), so PK/FK pairs
  stay consistent and distinct-key counts scale linearly;
- dims region/nation stay fixed (they are fixed-size in TPC-H too);
- documents/embeddings replicate under fresh ids with text/vectors
  unchanged — every doc gains K-1 exact twins, which *stresses* the
  dedup family (bigger LSH buckets, K-fold cluster sizes) rather than
  diluting it.

Usage: python scripts/scale_ladder.py [K] [out_dir] [--fresh]
(default K=10 -> ~sf1; prints one JSON line per rung plus a summary;
SPARK_GRAFT_KEEP_LADDER=1 keeps the generated warehouses for reruns;
SPARK_GRAFT_LADDER_QUERIES=a,b filters rows — EXTRA_QUERIES names are
selectable too; SPARK_GRAFT_LADDER_TRIALS=1 -> single-pass, no
warmup, for tens-of-minutes rows)

``--fresh`` mode (round-4 addition): the twin-replication rungs are
exactly the shape the exact-dedup cascade absorbs (every copy is an
identical twin, so the quadratic stages see a CONSTANT distinct
count). A flat twin ladder therefore proves the cascade works, but
says nothing about how the dedup/ANN family scales when the corpus
genuinely grows. --fresh replicates documents/embeddings with
hash-derived NEW content instead (fresh token sequences; fresh
uniform [-1,1]^64 vectors — same scheme as the fuzzer), so distinct
counts grow K-fold, the cascade can collapse nothing, and the
threshold-0.4 Theta(N^1.66) candidate bound + the production-0.85
regime are measured on real growth. Only the dedup/similarity subset
runs (the relational rows don't care how text was generated)."""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DIMS = ["region", "nation"]
ROW_GROUP = 100_000

# key column -> offset stride (> max key at sf0.1, see TESTDATA.md)
STRIDES = {
    "o_orderkey": 1_000_000,
    "l_orderkey": 1_000_000,
    "o_custkey": 100_000,
    "c_custkey": 100_000,
    "p_partkey": 100_000,
    "l_partkey": 100_000,
    "s_suppkey": 10_000,
    "l_suppkey": 10_000,
    "event_id": 10_000_000,
    "user_id": 10_000,
    "doc_id": 100_000,
    "vec_id": 100_000,
}

def _ann_lsh_prod(spark, sf_dir):
    """Production-regime ANN: threshold 0.85, L=8 tables x k=12 planes.

    The registered ``sim_ann_lsh`` pins threshold 0.4 — a 66° angle,
    barely off random — where LSH theory says candidate volume over
    DISTINCT vectors is Theta(N^1.66) for constant recall (rho =
    ln p1 / ln p2 ≈ 0.66). On ladder data the exact-dedup cascade
    inside the operator absorbs the K-fold replication (distinct
    count stays constant), so both rows read near-flat; the N^1.66
    law would reappear if the rungs added NEW vectors near the
    threshold instead of twins. Near-dup dedup in practice runs at
    >= 0.85, where k=12 makes random collisions ~8*2^-12 of pairs
    while exact/near twins always collide: this row shows the
    operator in its intended regime. The ladder's K-fold replication
    gives every vector K-1 exact twins (cos = 1.0), so true
    positives exist at any K."""
    from canadiannewsdatapipeline_spark.operators.similarity import (
        ann_lsh_multitable_pairs,
    )
    from canadiannewsdatapipeline_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    return ann_lsh_multitable_pairs(
        emb, "vec_id", "embedding", threshold=0.85, n_tables=8, n_planes=12
    )


def _ann_lsh_prod_mp(spark, sf_dir):
    """Production-regime ANN, bit-pool multi-probe configuration:
    threshold 0.85, pool=252, k=16 bits x L=16 tables, radius-1
    probes, Hamming screen at 70.

    Fresh-x100 (200k genuinely-distinct vectors) showed the flat
    8x12 multitable config above hits the same N^2/2^k candidate law
    as the threshold-0.4 row, one decade later: 9.1 s at x33 ->
    137.1 s at x100 (15x wall for 3x data; candidates ~N^2 * 8/4096,
    each paying a full 64-dim fold). The pool path fixes both
    factors: 16-bit buckets cut random collisions 16x per table,
    radius-1 probes recover the boundary recall deeper k loses, and
    the Hamming screen at 70 (boundary pairs expect 252*31.8/180
    ~= 45 +- 6; random pairs 126 +- 8) passes essentially no random
    candidate to the exact fold. Measured at fresh-x100: 5.9 s
    (23x less wall). Planted-pair recall (scripts/prod_recall.py,
    20k planted pairs at cos in [0.85, 0.98]): this config 98.8%
    vs the 8x12 multitable's 79.3%, zero false positives for both —
    strictly better on BOTH axes."""
    from canadiannewsdatapipeline_spark.operators.similarity import (
        prod_near_dup_pairs,
    )
    from canadiannewsdatapipeline_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    # the operating point lives in the library (PROD_NEAR_DUP_MP),
    # not here — the ladder measures what a user actually gets
    return prod_near_dup_pairs(emb, "vec_id", "embedding")


def _ann_mp_t04_count(spark, sf_dir):
    """Count-only twin of the threshold-0.4 multiprobe row: aggregate
    COUNT(*) over the verified pairs instead of materializing them.
    At threshold 0.4 the qualifying output is itself Theta(N^2) (a
    ~5e-4 constant fraction of all pairs qualifies on fresh random
    vectors), so the full row's rung-over-rung growth is output-bound
    by construction (SCALE.md §Round-5). This twin runs every stage —
    signature, probes, candidate join, Hamming screen, exact verify,
    pair-dedup — and returns ONE row, so the full-vs-count delta at a
    rung prices returned-row materialization, and the count row's own
    growth shows the pipeline cost with output volume factored out."""
    from pyspark.sql import functions as F

    from canadiannewsdatapipeline_spark.queries import QUERIES

    return (
        QUERIES["sim_ann_lsh_multiprobe"]
        .fn(spark, sf_dir)
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def _mp_forced_shuffle_chunked(spark, sf_dir):
    """The threshold-0.4 multiprobe config forced to shuffle mode WITH
    the r7 chunked pass mode: 160 tables in 8 eager 20-table passes.
    The single-pass shuffle form exchanges the whole unscreened
    candidate stream (~1e9 rows at fresh-x30) and died filling >70 GB
    of shuffle files (SCALE.md §Round-6); each chunked pass exchanges
    ~1/8 of that and eager_passes reclaims a pass's shuffle files
    before the next starts, so the same row completes with bounded
    disk. Timed against ann_mp_t04 (broadcast mode) on the same
    warehouse, this prices the above-gate chunked tier."""
    from canadiannewsdatapipeline_spark.operators.similarity import (
        ann_lsh_multiprobe_pairs,
    )
    from canadiannewsdatapipeline_spark.queries.llm import (
        _COS_THRESHOLD,
        _MP_BITS,
        _MP_HAMMING,
        _MP_POOL,
        _MP_RADIUS,
        _MP_TABLES,
    )
    from canadiannewsdatapipeline_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    return ann_lsh_multiprobe_pairs(
        emb, "vec_id", "embedding",
        threshold=_COS_THRESHOLD, pool=_MP_POOL, n_bits=_MP_BITS,
        n_tables=_MP_TABLES, probe_radius=_MP_RADIUS,
        hamming_max=_MP_HAMMING, broadcast_corpus=False,
        tables_per_pass=20, eager_passes=True,
    )


def _mp_forced_shuffle(spark, sf_dir, prod: bool):
    """The registered/prod multiprobe config with the corpus-side
    joins FORCED to shuffle mode (broadcast_corpus=False) — the shape
    the auto gate picks past MP_BROADCAST_MAX_INPUT_BYTES. Timed
    against the broadcast-mode rows on the same warehouses, this
    prices the mode delta at ladder scale (the gate's crossover is
    memory-bound, not wall-bound: above it broadcast OOMs executors
    rather than losing on wall — see similarity.py).

    tables_per_pass is pinned to n_tables since r8: with the r8
    auto-sizer, a bare broadcast_corpus=False call above the disk
    budget would auto-chunk — the right default for a user, but this
    row exists to measure the SINGLE-PASS shuffle anchor, so it pins
    the pre-auto form explicitly (the documented opt-out)."""
    from canadiannewsdatapipeline_spark.operators.similarity import (
        PROD_NEAR_DUP_MP,
        ann_lsh_multiprobe_pairs,
    )
    from canadiannewsdatapipeline_spark.queries.llm import (
        _COS_THRESHOLD,
        _MP_BITS,
        _MP_HAMMING,
        _MP_POOL,
        _MP_RADIUS,
        _MP_TABLES,
    )
    from canadiannewsdatapipeline_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    if prod:
        return ann_lsh_multiprobe_pairs(
            emb, "vec_id", "embedding",
            **PROD_NEAR_DUP_MP, broadcast_corpus=False,
            tables_per_pass=PROD_NEAR_DUP_MP["n_tables"],
        )
    return ann_lsh_multiprobe_pairs(
        emb, "vec_id", "embedding",
        threshold=_COS_THRESHOLD, pool=_MP_POOL, n_bits=_MP_BITS,
        n_tables=_MP_TABLES, probe_radius=_MP_RADIUS,
        hamming_max=_MP_HAMMING, broadcast_corpus=False,
        tables_per_pass=_MP_TABLES,
    )


def _mp_prod_shuffle_chunked(spark, sf_dir):
    """r7 verdict #4: the PROD preset with the chunk/eager knobs
    engaged through its **overrides pass-through, in forced shuffle
    mode — pins that the knobs compose with the preset at scale. The
    prod candidate stream is ~10^3x smaller than the t04 stress
    row's, so this is expected to be boring: 4-table eager passes
    over the preset's 16 tables."""
    from canadiannewsdatapipeline_spark.operators.similarity import (
        prod_near_dup_pairs,
    )
    from canadiannewsdatapipeline_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    return prod_near_dup_pairs(
        emb, "vec_id", "embedding",
        broadcast_corpus=False, tables_per_pass=4, eager_passes=True,
    )


def _mp_t04_shuffle_auto(spark, sf_dir):
    """r8: the t04 config in the shuffle tier with EVERYTHING ELSE
    default — what a user above the broadcast gate gets without
    knowing any knob exists. The auto-sizer estimates the candidate
    stream from the input relation's Catalyst size, compares it to
    spark.cndp.mp.diskBudgetBytes (default 32 GiB) and picks
    tables_per_pass + eager passes itself; at fresh-x30 the sizing
    rule lands on the measured-good 4x40-pass point."""
    from canadiannewsdatapipeline_spark.operators.similarity import (
        ann_lsh_multiprobe_pairs,
    )
    from canadiannewsdatapipeline_spark.queries.llm import (
        _COS_THRESHOLD,
        _MP_BITS,
        _MP_HAMMING,
        _MP_POOL,
        _MP_RADIUS,
        _MP_TABLES,
    )
    from canadiannewsdatapipeline_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    return ann_lsh_multiprobe_pairs(
        emb, "vec_id", "embedding",
        threshold=_COS_THRESHOLD, pool=_MP_POOL, n_bits=_MP_BITS,
        n_tables=_MP_TABLES, probe_radius=_MP_RADIUS,
        hamming_max=_MP_HAMMING, broadcast_corpus=False,
    )


EXTRA_QUERIES = {
    "ann_lsh_prod_thresh": _ann_lsh_prod,
    "ann_lsh_prod_mp": _ann_lsh_prod_mp,
    "ann_mp_t04_count": _ann_mp_t04_count,
    # mode-comparison rows: select via SPARK_GRAFT_LADDER_QUERIES
    # (not in any default subset — they exist to measure the
    # broadcast-vs-shuffle delta, not to run every ladder)
    "ann_mp_t04_shuffle": lambda s, d: _mp_forced_shuffle(s, d, False),
    "ann_lsh_prod_mp_shuffle": lambda s, d: _mp_forced_shuffle(s, d, True),
    "ann_mp_t04_shuffle_chunked": _mp_forced_shuffle_chunked,
    "ann_lsh_prod_mp_shuffle_chunked": _mp_prod_shuffle_chunked,
    "ann_mp_t04_shuffle_auto": _mp_t04_shuffle_auto,
}

# the scale-safe headline set (quadratic CORRECTNESS-only baselines
# excluded by construction — bench.py's HEADLINE already is that set)
HEADLINE_SUBSET = [
    "q1_pricing_summary",
    "q2_enriched_join_dedup",
    "q8_top_words",
    "tpch_q3_shipping_priority",
    "tpch_q5_regional_volume",
    "tpch_q8_market_share",
    "j7_disjunctive_min",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_lsh_verified",
    # four similarity tiers on the same corpus: the exact baseline
    # (linear in N for fixed queries), the frozen-oracle threshold-0.4
    # LSH (Theta(N^1.66) by theory — superlinear here is EXPECTED, see
    # _ann_lsh_prod), the round-5 bit-pool multi-probe path (the
    # scale-safe threshold-0.4 configuration), and the
    # production-threshold LSH (near-flat)
    "sim_topk_cosine",
    "sim_topk_ann",
    "sim_ann_lsh",
    "sim_ann_lsh_multiprobe",
    "ann_lsh_prod_thresh",
    "ann_lsh_prod_mp",
    "text_quality",
    "events_sessionize_stats",
    "events_asof_attribution",
    "pack_token_shards",
    "scd2_user_history",
    "text_bigram_logprob",
]


# --fresh content generators: copy i = 0 passes the original through;
# copies i > 0 get hash-derived NEW content (md5-seeded, so reruns are
# deterministic). Documents keep their token count but draw fresh
# letter-only tokens (digits stripped from an md5 window — a small
# a-f alphabet, plenty of 3-gram shingle diversity). Embeddings get
# 64 fresh uniform [-1, 1] components (random 64-dim directions:
# pairwise cosines concentrate near 0, so threshold survivors stay
# rare and the measurement isolates CANDIDATE volume, the LSH cost
# driver, from true-pair output volume).
_FRESH_TEXT = """
    CASE WHEN i = 0 THEN text ELSE array_to_string(
      [regexp_replace(
         substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)
                    || ':' || CAST(j AS VARCHAR)), 1, 10),
         '[0-9]', '', 'g')
       FOR j IN generate_series(
         1, GREATEST(len(regexp_extract_all(lower(text), '[a-z]+')), 1))],
      ' ')
    END AS text"""

_FRESH_VEC = """
    CASE WHEN i = 0 THEN embedding ELSE
      [CAST(CAST(concat('0x',
              substr(md5(CAST(vec_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)
                         || ':' || CAST(j AS VARCHAR)), 1, 6)) AS BIGINT)
            / 8388607.5 - 1.0 AS FLOAT)
       FOR j IN generate_series(1, 64)]
    END AS embedding"""

_FRESH_COLS = {"text": _FRESH_TEXT, "embedding": _FRESH_VEC}


def build_rung(
    con: duckdb.DuckDBPyConnection, k: int, out: str, fresh: bool = False
) -> None:
    os.makedirs(out, exist_ok=True)
    tables = [
        f.removesuffix(".parquet")
        for f in sorted(os.listdir(SRC))
        if f.endswith(".parquet")
    ]
    for t in tables:
        src = f"{SRC}/{t}.parquet"
        dst = f"{out}/{t}.parquet"
        if t in DIMS or k == 1:
            # fixed dims copy through (still rewritten so the row-group
            # layout is uniform across the rung)
            con.execute(
                f"COPY (SELECT * FROM '{src}') TO '{dst}' "
                f"(FORMAT PARQUET, ROW_GROUP_SIZE {ROW_GROUP})"
            )
            continue
        cols = [
            r[0]
            for r in con.execute(f"DESCRIBE SELECT * FROM '{src}'").fetchall()
        ]
        fresh_here = fresh and t in ("documents", "embeddings")
        proj = ", ".join(
            f"{c} + i * {STRIDES[c]} AS {c}"
            if c in STRIDES
            else (_FRESH_COLS[c] if fresh_here and c in _FRESH_COLS else c)
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {proj} FROM '{src}', "
            f"(SELECT unnest(generate_series(0, {k - 1})) AS i) g) "
            f"TO '{dst}' (FORMAT PARQUET, ROW_GROUP_SIZE {ROW_GROUP})"
        )
    # stamp the build mode LAST so the marker doubles as a completion
    # sentinel: an interrupted build leaves no marker, and a kept
    # warehouse can never be silently re-timed under the other mode's
    # label (fresh rows timed on twin data would measure the cascade's
    # collapse, not fresh scaling)
    with open(os.path.join(out, "LADDER_MODE"), "w") as fh:
        fh.write("fresh" if fresh else "twin")


# the cascade-sensitive subset --fresh measures (relational rows are
# content-agnostic; rerunning them would just repeat the twin ladder)
FRESH_SUBSET = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_lsh_verified",
    "sim_topk_cosine",
    "sim_topk_ann",
    "sim_ann_lsh",
    "sim_ann_lsh_multiprobe",
    "ann_mp_t04_count",
    "ann_lsh_prod_thresh",
    "ann_lsh_prod_mp",
]


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--fresh"]
    fresh = "--fresh" in sys.argv[1:]
    k_top = int(args[0]) if len(args) > 0 else 10
    base = (
        args[1]
        if len(args) > 1
        else ("/tmp/scale_ladder_fresh" if fresh else "/tmp/scale_ladder")
    )
    rungs = sorted({1, max(2, k_top // 3), k_top})
    subset = FRESH_SUBSET if fresh else HEADLINE_SUBSET
    # optional row filter, e.g. to extend a regime's rungs without
    # re-timing rows whose scaling law is already measured (the
    # threshold-0.4 LSH row is ~N^2/2^k on fresh data BY DESIGN —
    # see SCALE.md §Round-4 — and dominates any deep fresh rung)
    only = os.environ.get("SPARK_GRAFT_LADDER_QUERIES")
    if only:
        wanted = set(only.split(","))
        # a filtered run may also select EXTRA_QUERIES rows outside
        # the mode's default subset (the broadcast-vs-shuffle
        # comparison rows exist only there)
        selectable = list(subset) + [
            q for q in EXTRA_QUERIES if q not in subset
        ]
        unknown = sorted(wanted - set(selectable))
        if unknown:
            print(
                f"WARNING: SPARK_GRAFT_LADDER_QUERIES names not in the "
                f"{'fresh' if fresh else 'twin'} subset nor EXTRA_QUERIES, "
                f"dropped: {unknown}",
                file=sys.stderr,
            )
        subset = [q for q in selectable if q in wanted]
        if not subset:
            print("ERROR: query filter left nothing to time", file=sys.stderr)
            return 2

    mode = "fresh" if fresh else "twin"
    con = duckdb.connect()
    for k in rungs:
        out = f"{base}/x{k}"
        marker = os.path.join(out, "LADDER_MODE")
        if os.path.isdir(out) and not os.path.isfile(marker):
            # no completion sentinel => an interrupted build left a
            # partial warehouse; rebuild rather than time bad data
            print(f"NOTE: {out} exists without LADDER_MODE — rebuilding", file=sys.stderr)
            shutil.rmtree(out)
        if not os.path.isdir(out):
            build_rung(con, k, out, fresh)
        else:
            stamped = open(marker).read().strip()
            if stamped != mode:
                print(
                    f"ERROR: {out} was built in {stamped!r} mode but this is a "
                    f"{mode!r} run — timings would be silently mislabeled. "
                    f"Delete the directory or point at a different base.",
                    file=sys.stderr,
                )
                return 2
    # flush dirty pages before timing: parquet write-back racing the
    # first timed scans inflated x33 q1 4x vs the (settled) x100 rung
    os.sync()

    from canadiannewsdatapipeline_spark.queries import QUERIES
    from canadiannewsdatapipeline_spark.session import get_spark

    spark = get_spark("scale-ladder")
    summary = {}
    for k in rungs:
        out = f"{base}/x{k}"
        timings = {}
        # SPARK_GRAFT_LADDER_TRIALS=1 is single-pass mode for rows in
        # the tens-of-minutes class (fresh-x100 threshold-0.4: the
        # Theta(N^2) output alone makes any trial ~40 min): no untimed
        # warmup (plan build is seconds against such a row; label the
        # number single-pass in SCALE.md). Default stays warmup +
        # min-of-2.
        raw_trials = os.environ.get("SPARK_GRAFT_LADDER_TRIALS", "2")
        try:
            # clamp: 0/negative would skip every trial and crash on
            # min([]) with an unhelpful ValueError (r6 advice)
            n_trials = max(1, int(raw_trials))
        except ValueError:
            print(
                f"ERROR: SPARK_GRAFT_LADDER_TRIALS={raw_trials!r} is not an "
                "integer (use 1 for single-pass mode, >=2 for warmup + min-of-N)",
                file=sys.stderr,
            )
            return 2
        for name in subset:
            fn = EXTRA_QUERIES.get(name) or QUERIES[name].fn
            if n_trials > 1:
                fn(spark, out).write.format("noop").mode("overwrite").save()
            trials = []
            for _ in range(n_trials):
                t0 = time.perf_counter()
                fn(spark, out).write.format("noop").mode("overwrite").save()
                trials.append(time.perf_counter() - t0)
            timings[name] = round(min(trials), 3)
        total = round(sum(timings.values()), 3)
        summary[f"x{k}"] = {"total_sec": total, "queries": timings}
        print(json.dumps({"rung": f"x{k}", "total_sec": total, "queries": timings}))

    base_total = summary[f"x{rungs[0]}"]["total_sec"]
    print(
        json.dumps(
            {
                "metric": "scale_ladder_fresh" if fresh else "scale_ladder",
                "rungs": {
                    r: {
                        "total_sec": s["total_sec"],
                        "wall_vs_x1": round(s["total_sec"] / base_total, 2),
                    }
                    for r, s in summary.items()
                },
                "data_vs_x1": {f"x{k}": k for k in rungs},
            }
        )
    )
    spark.stop()
    if os.environ.get("SPARK_GRAFT_KEEP_LADDER") != "1":
        shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
