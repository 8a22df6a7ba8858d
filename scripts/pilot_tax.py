"""Measure the calibration pilot's overhead where it is PURE cost
(r10 verdict #5): on a well-estimated uniform corpus the 1/8-size
pilot pass buys nothing — the estimate is right, no re-chunk fires —
so its price is one extra pass barrier plus a finer first slice. The
r10 round ARGUED that price ("~the fixed per-pass floor"); this
script measures it: the same adaptive chunked run on a fresh-x10
uniform warehouse, with the pilot enabled (default) vs disabled
(MP_PILOT_DIVISOR=1 resolves pilot_tables=None), one child
subprocess per configuration (fresh JVM + scratch — the r9
clean-session methodology), N trials each.

Noise caveats (SCALE.md), corrected r12: WALLS on this box drift up
to 1.6x between sessions, so the claim this measures is the RELATIVE
with/without delta from interleaved same-session-class trials. Pass
DECISIONS and shuffle-write BYTES are bit-stable; disk PEAKS were
NOT under the r11 async cleanup (SCALE_LADDER_PILOT_TAX_r11.json:
bit-identical twins peaked 6.45 GB vs 3.67 GB under a 4 GiB budget,
3 of 4 trials breaching on ContextCleaner lag alone — the r11 form
of this docstring wrongly claimed peaks bit-stable). The r12
deterministic inter-pass reclamation exists to make every trial hold
the budget; this script is its acceptance gate (``budget_held_all``).

The corpus rotates per round (r11 verdict #5): ``--seed`` prefixes
the fresh-content md5 keys (SPARK_GRAFT_LADDER_CONTENT_SEED), so the
fix is validated on unmemorized data; the artifact records the seed.

Usage:
  python scripts/pilot_tax.py [--k 10] [--budget BYTES]
      [--trials 3] [--seed rYYYYMMDD] [--out OUT.json]   # run in tmux
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/tmp/pilot_tax"


def child(sf_dir: str, budget: int, pilot_divisor: int) -> int:
    from scale_ladder import _DiskTrace  # noqa: E402

    import canadiannewsdatapipeline_spark.operators.similarity as sim
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
    from canadiannewsdatapipeline_spark.session import get_spark
    from canadiannewsdatapipeline_spark.sources.registry import load_table

    sim.MP_PILOT_DIVISOR = pilot_divisor
    spark = get_spark("pilot-tax")
    tracer = _DiskTrace()
    emb = load_table(spark, sf_dir, "embeddings")
    sim.LAST_MP_SIZING_REPORT = None
    sc = spark.sparkContext
    shuf0 = sim._observed_shuffle_write_bytes(sc)
    t0 = time.perf_counter()
    pairs = ann_lsh_multiprobe_pairs(
        emb, "vec_id", "embedding", threshold=_COS_THRESHOLD,
        pool=_MP_POOL, n_bits=_MP_BITS, n_tables=_MP_TABLES,
        probe_radius=_MP_RADIUS, hamming_max=_MP_HAMMING,
        broadcast_corpus=False, disk_budget_bytes=budget,
    )
    pairs.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    shuf1 = sim._observed_shuffle_write_bytes(sc)
    disk = tracer.stop()
    fb = sim.LAST_MP_SIZING_REPORT
    print(json.dumps({
        "pilot_divisor": pilot_divisor,
        "sec": round(wall, 3),
        "peak_disk_bytes": disk["peak_disk_bytes"],
        "budget_held": disk["peak_disk_bytes"] <= budget,
        "shuffle_write_bytes": (
            shuf1 - shuf0
            if shuf0 is not None and shuf1 is not None
            else None
        ),
        "pass_tables": [p["tables"] for p in (fb or {}).get("passes", [])],
        "pilot_tables": (fb or {}).get("pilot_tables"),
        "resizes": (fb or {}).get("resizes"),
        "reclaim": (fb or {}).get("reclaim"),
    }))
    spark.stop()
    return 0


def main() -> int:
    argv = sys.argv[1:]
    if "--child" in argv:
        i = argv.index("--child")
        budget = int(argv[argv.index("--budget") + 1])
        divisor = int(argv[argv.index("--divisor") + 1])
        return child(argv[i + 1], budget, divisor)

    def opt(name, default):
        return argv[argv.index(name) + 1] if name in argv else default

    k = int(opt("--k", "10"))
    budget = int(opt("--budget", str(4 * 1024**3)))
    trials = int(opt("--trials", "3"))
    seed = opt("--seed", "r" + time.strftime("%Y%m%d"))
    out_path = opt("--out", "PILOT_TAX.json")

    import duckdb

    from scale_ladder import build_rung  # noqa: E402

    whs = f"{BASE}/fresh_x{k}_{seed}"
    os.environ["SPARK_GRAFT_LADDER_CONTENT_SEED"] = seed
    if not os.path.isfile(os.path.join(whs, "LADDER_MODE")):
        shutil.rmtree(whs, ignore_errors=True)
        build_rung(duckdb.connect(), k, whs, "fresh")
    os.sync()
    runs = []
    # interleave the two configurations so slow box drift debits both
    for trial in range(trials):
        for divisor in (8, 1):  # 8 = shipped pilot, 1 = pilot off
            proc = subprocess.run(
                [
                    sys.executable, os.path.abspath(__file__),
                    "--child", whs, "--budget", str(budget),
                    "--divisor", str(divisor),
                ],
                capture_output=True, text=True,
            )
            sys.stderr.write(proc.stderr[-2000:])
            if proc.returncode != 0:
                print(f"ERROR: divisor={divisor} child failed",
                      file=sys.stderr)
                return proc.returncode or 1
            rec = json.loads(proc.stdout.strip().splitlines()[-1])
            rec["trial"] = trial
            runs.append(rec)
            print(json.dumps(rec), flush=True)
    by = {d: [r["sec"] for r in runs if r["pilot_divisor"] == d]
          for d in (8, 1)}
    result = {
        "metric": "mp_pilot_tax_fresh_uniform",
        "k_replication": k,
        "content_seed": seed,
        "budget_bytes": budget,
        "with_pilot_sec": by[8],
        "without_pilot_sec": by[1],
        "pilot_tax_sec_min": round(min(by[8]) - min(by[1]), 3),
        # the acceptance gate for the r12 deterministic reclaim is the
        # SHIPPED configuration (pilot on); the pilot-OFF control arm
        # can breach for a reason cleanup can never fix — its first
        # full-size pass alone may exceed the budget when the model
        # under-estimates (the documented reason the pilot leads)
        "budget_held_all_with_pilot": all(
            r["budget_held"] for r in runs if r["pilot_divisor"] == 8
        ),
        "budget_held_all": all(r["budget_held"] for r in runs),
        "reclaim_deterministic_all": all(
            (r.get("reclaim") or {}).get("deterministic") for r in runs
        ),
        "runs": runs,
    }
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps({"written": out_path}))
    if os.environ.get("SPARK_GRAFT_KEEP_LADDER") != "1":
        shutil.rmtree(BASE, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
