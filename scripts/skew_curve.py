"""Map the sizing model's validity boundary at INTERMEDIATE skew
(r9 verdict #5): r9 measured the two extremes — uniform corpora
(model right, exact count reads 0.71x under it) and a 16-cluster
corpus (model 11.2x under truth) — and built the max(exact, model)
combiner from those two points. This sweep turns the rationale into
a curve: clustered warehouses at NC cluster counts between the
extremes, recording for each

- the uniform byte-model estimate and its worst-case bound,
- the exact candidate count (the skew-immune estimator),
- which estimator the 'auto' combiner sized from,
- the zero-knob run's decision (K, passes), measured shuffle-write
  bytes, wall, and peak scratch disk vs the tight budget,

so the NC where max(exact, model) switches drivers is measured, and
any mid-skew regime where BOTH estimators under-read the true stream
would show up as observed/est feedback ratios past 1.

Theory says the under-estimate factor is ~2^k/(masks*NC) = 4096/(13*NC)
at k=12/r=1: ~19.7x at NC=16 (measured 11.2x — partial concentration),
~4.9x at NC=64, ~1.2x at NC=256, below 1 at NC=1024 (uniform-ish; the
model floor should take over between 256 and 1024).

Usage:
  python scripts/skew_curve.py [--nc 16,64,256,1024] [--k 3]
      [--budget BYTES] [--out OUT.json]

One child subprocess per NC (fresh JVM + scratch dirs — the r9
--clean-session methodology), warehouses built by the parent via
scale_ladder.build_rung (deterministic md5 content). ~3-4 min per NC
at k=3 on this box; run the whole sweep in tmux.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/tmp/skew_curve"


def child(sf_dir: str, budget: int) -> int:
    from scale_ladder import _DiskTrace  # noqa: E402

    import canadiannewsdatapipeline_spark.operators.similarity as sim
    from canadiannewsdatapipeline_spark.operators.similarity import (
        ann_lsh_multiprobe_pairs,
        mp_mode_report,
    )
    from canadiannewsdatapipeline_spark.queries.llm import (
        _COS_THRESHOLD,
        _MP_BITS,
        _MP_HAMMING,
        _MP_POOL,
        _MP_RADIUS,
        _MP_TABLES,
    )
    from canadiannewsdatapipeline_spark.session import get_spark
    from canadiannewsdatapipeline_spark.sources.registry import load_table

    spark = get_spark("skew-curve")
    tracer = _DiskTrace()
    emb = load_table(spark, sf_dir, "embeddings")
    common = dict(
        pool=_MP_POOL, n_bits=_MP_BITS, n_tables=_MP_TABLES,
        probe_radius=_MP_RADIUS, broadcast_corpus=False,
    )
    # the pure model view (zero jobs) ...
    model_rep = mp_mode_report(
        emb, "vec_id", "embedding", sizing="model",
        disk_budget_bytes=budget, **common,
    )
    # ... and the zero-knob 'auto' resolution (runs the count job
    # whenever the worst-case bound exceeds the budget; r11: passes
    # hamming_max so the guard-zone screen sample — which the run
    # itself consults — shows up in the recorded decision too)
    auto_rep = mp_mode_report(
        emb, "vec_id", "embedding", disk_budget_bytes=budget,
        hamming_max=_MP_HAMMING, **common,
    )
    sim.LAST_MP_SIZING_REPORT = None
    sc = spark.sparkContext
    shuf0 = sim._observed_shuffle_write_bytes(sc)
    t0 = time.perf_counter()
    pairs = ann_lsh_multiprobe_pairs(
        emb, "vec_id", "embedding", threshold=_COS_THRESHOLD,
        hamming_max=_MP_HAMMING, disk_budget_bytes=budget, **common,
    )
    pairs.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    shuf1 = sim._observed_shuffle_write_bytes(sc)
    disk = tracer.stop()
    fb = sim.LAST_MP_SIZING_REPORT
    rec = {
        "sf_dir": sf_dir,
        "n_rows": emb.count(),
        "model_est_bytes": model_rep["est_stream_bytes"],
        "model_worst_case_bytes": auto_rep["model_worst_case_bytes"],
        "exact_stream_bytes": auto_rep["est_exact_bytes"],
        "est_source": auto_rep["est_source"],
        "sizing_effective": auto_rep["sizing_effective"],
        "est_stream_bytes": auto_rep["est_stream_bytes"],
        "decision": {
            "tables_per_pass": auto_rep["tables_per_pass"],
            "n_passes": auto_rep["n_passes"],
            "eager_passes": auto_rep["eager_passes"],
            "pilot_tables": auto_rep["pilot_tables"],
            "adaptive": auto_rep["adaptive"],
            "screen_sample": auto_rep.get("screen_sample"),
            "single_pass_guard": auto_rep.get("single_pass_guard"),
        },
        "run": {
            "sec": round(wall, 3),
            "budget_bytes": budget,
            "peak_disk_bytes": disk["peak_disk_bytes"],
            "budget_held": disk["peak_disk_bytes"] <= budget,
            "shuffle_write_bytes": (
                shuf1 - shuf0
                if shuf0 is not None and shuf1 is not None
                else None
            ),
            "mp_sizing_report": fb,
        },
    }
    if rec["exact_stream_bytes"] and rec["model_est_bytes"]:
        rec["exact_over_model"] = round(
            rec["exact_stream_bytes"] / rec["model_est_bytes"], 3
        )
    print(json.dumps(rec))
    spark.stop()
    return 0


def main() -> int:
    argv = sys.argv[1:]
    if "--child" in argv:
        i = argv.index("--child")
        budget = int(argv[argv.index("--budget") + 1])
        return child(argv[i + 1], budget)

    def opt(name, default):
        return argv[argv.index(name) + 1] if name in argv else default

    ncs = [int(x) for x in opt("--nc", "16,64,256,1024").split(",")]
    k = int(opt("--k", "3"))
    budget = int(opt("--budget", str(2 * 1024**3)))
    out_path = opt("--out", "SKEW_CURVE.json")

    import duckdb

    from scale_ladder import build_rung  # noqa: E402

    curve = {}
    for nc in ncs:
        whs = f"{BASE}/nc{nc}_x{k}"
        if not os.path.isdir(whs) or not os.path.isfile(
            os.path.join(whs, "LADDER_MODE")
        ):
            shutil.rmtree(whs, ignore_errors=True)
            os.environ["SPARK_GRAFT_LADDER_CLUSTERS"] = str(nc)
            build_rung(duckdb.connect(), k, whs, "clustered")
        os.sync()
        proc = subprocess.run(
            [
                sys.executable, os.path.abspath(__file__),
                "--child", whs, "--budget", str(budget),
            ],
            capture_output=True, text=True,
        )
        sys.stderr.write(proc.stderr)
        if proc.returncode != 0:
            print(f"ERROR: nc={nc} child failed", file=sys.stderr)
            return proc.returncode or 1
        rec = json.loads(proc.stdout.strip().splitlines()[-1])
        rec["nc"] = nc
        curve[f"nc{nc}"] = rec
        print(json.dumps(rec))
    result = {
        "metric": "clustered_skew_curve_t04_tight_budget",
        "k_replication": k,
        "budget_bytes": budget,
        "theory_note": (
            "under-estimate factor ~2^k/(masks*NC) = 4096/(13*NC); "
            "combiner should switch from exact-driven to model-floor "
            "as NC grows toward uniform"
        ),
        "curve": curve,
    }
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps({"written": out_path, "ncs": ncs}))
    if os.environ.get("SPARK_GRAFT_KEEP_LADDER") != "1":
        shutil.rmtree(BASE, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
