"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from canadiannewsdatapipeline_spark.queries import QUERIES  # noqa: E402
from canadiannewsdatapipeline_spark.queries.registry import (  # noqa: E402
    is_plan_cached,
)
from canadiannewsdatapipeline_spark.session import get_spark  # noqa: E402

HEADLINE = [
    # relational core
    "q1_pricing_summary",
    "q2_enriched_join_dedup",
    "q7_daily_timeseries",
    "q8_top_words",
    "tpch_q3_shipping_priority",
    "tpch_q5_regional_volume",
    "j7_disjunctive_min",
    "p12_top_n_per_group",
    # news model DAG end-to-end
    "news_transformed",
    "news_articles_mart",
    # training-data extensions
    "dedup_exact",
    # LSH + exact-verify composition — the shape you'd run at 100 TB
    # (the quadratic ngram-jaccard stays a CORRECTNESS-only baseline)
    "dedup_lsh_verified",
    "dedup_minhash_lsh",
    "sim_topk_cosine",
    "sim_topk_ann",
    "text_quality",
    "stream_windowed_counts",
    "events_sessionize_stats",
    # corpus assembly (added r2)
    "events_asof_attribution",
    "pack_token_shards",
    # round-2 additions: multi-join share, SCD2 history, LM scoring
    "tpch_q8_market_share",
    "scd2_user_history",
    "text_bigram_logprob",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark("newsflow-bench")

    names = [n for n in HEADLINE if n in QUERIES]
    # warm up the JVM/session on a neutral query (NOT a headline one:
    # the registry's plan cache would memoize it and its measured
    # plan-build time below would be a cache hit, unlike every other
    # row's)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    detail: dict[str, dict] = {}
    n_trials = 3
    for name in names:
        # collect between queries so one query's garbage doesn't bill
        # the next one's trials
        spark.sparkContext._jvm.System.gc()
        # untimed warmup: plan compile + codegen + page-cache priming,
        # so the timed trials measure execution, not first-run setup.
        # The first fn() call is the registry plan cache's miss —
        # construction + analysis happen here, and the timed trials
        # below reuse the analyzed plan. Report that one-time cost as
        # "plan" so the split is transparent (streaming queries are
        # uncached and run a job inside the call; no "plan" for them).
        # "plan" is only honest if this first call is actually the
        # plan cache's miss — a session reused across invocations (or
        # future code touching QUERIES before this loop) would make it
        # a ~0s cache hit silently reported as the build cost. The
        # check must be stamp-aware, not bare key membership: a
        # warehouse regenerated in place keeps the key but re-plans
        # (stamp mismatch), and that genuinely measured build cost
        # should be reported, not silently dropped
        was_cached = is_plan_cached(spark, name, sf_dir)
        t0 = time.perf_counter()
        df0 = QUERIES[name].fn(spark, sf_dir)
        plan_sec = (
            round(time.perf_counter() - t0, 3)
            if hasattr(QUERIES[name].fn, "__wrapped__") and not was_cached
            else None
        )
        df0.write.format("noop").mode("overwrite").save()
        trials = []
        for _ in range(n_trials):
            t0 = time.perf_counter()
            df = QUERIES[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            trials.append(time.perf_counter() - t0)
        # min is the headline (least-noise estimator on a shared box);
        # mean/n ride along so round-over-round drift is attributable
        # to noise vs code
        timings[name] = round(min(trials), 3)
        detail[name] = {
            "min": round(min(trials), 3),
            "mean": round(sum(trials) / len(trials), 3),
            "n": n_trials,
        }
        if plan_sec is not None:
            detail[name]["plan"] = plan_sec

    emit(timings, detail, sf, n_trials)
    spark.stop()


def emit(
    timings: dict[str, float],
    detail: dict[str, dict],
    sf: float,
    n_trials: int,
    detail_path: str | None = None,
) -> None:
    """Print the contract line; write the per-query detail to a file.

    stdout carries EXACTLY ONE compact JSON line (total + per-query
    mins, ~900 chars) so a capture window of 2000 chars — head OR
    tail — always holds it whole and parseable; the r4/r5 shape
    (detail inline) overflowed the driver's window and forced both
    judges to re-run bench to adjudicate round-over-round.

    The per-query mean/n/plan detail must NOT be printed at all: the
    r11/r12 shape (a second `bench_detail` JSON line on stderr) made
    the driver's merged-output parser — which takes the LAST JSON line
    of stdout+stderr combined — read the detail line instead of this
    contract line, so PERF_r11/PERF_r12 were empty. The detail goes to
    a FILE next to this script; no second JSON line may exist anywhere
    in merged stdout+stderr.

    "spread" is an ADDITIVE sibling key (existing keys unchanged): sum
    of per-query trial means vs the headline sum of mins, plus the
    trial count, so a reader can bound session noise without the
    detail file — a sum_mean/value ratio well above ~1.1 flags a
    loaded box rather than a code change.
    """
    total = round(sum(timings.values()), 3)
    mean_total = round(sum(d["mean"] for d in detail.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "spread": {
                    "sum_mean": mean_total,
                    "trials": n_trials,
                    "detail_file": "BENCH_DETAIL.json",
                },
            }
        ),
        flush=True,
    )
    if detail_path is None:
        detail_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
        )
    with open(detail_path, "w") as f:
        json.dump(
            {"metric": "bench_detail", "queries_detail": detail}, f, indent=1
        )
        f.write("\n")


if __name__ == "__main__":
    main()
