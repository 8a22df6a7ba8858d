"""Measure ANN recall vs the exact tier on a (possibly ladder-built)
warehouse: ground truth = all pairs with exact cos >= threshold
(numpy, float64, 4-dp rounding — same contract as cosine_pairs);
reported = the registered ANN pair query's output.

Usage: python scripts/ann_recall.py <sf_dir> [query ...]
(default queries: sim_ann_lsh_multiprobe)

Prints one JSON line per query: {"query", "n_vectors", "true_pairs",
"returned", "true_returned", "recall", "false_positives"}.
False positives are impossible by construction (exact verify) — the
field is printed so the claim is checked, not assumed.
"""

from __future__ import annotations

import json
import os
import sys

import duckdb
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

THRESHOLD = 0.4


def ground_truth(sf_dir: str):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    vecs = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.sqrt((vecs * vecs).sum(1))
    true_pairs: set[tuple[int, int]] = set()
    # blockwise so a 60k-vector rung stays in memory
    block = 4096
    n = len(vecs)
    with np.errstate(divide="ignore", invalid="ignore"):
        for s in range(0, n, block):
            sims = vecs[s : s + block] @ vecs.T
            sims /= np.outer(norms[s : s + block], norms)
            sims = np.round(sims, 4)
            bi, bj = np.nonzero(sims >= THRESHOLD)
            for i, j in zip(bi, bj):
                gi, gj = s + int(i), int(j)
                if gi < gj:
                    true_pairs.add((int(ids[gi]), int(ids[gj])))
    return len(ids), true_pairs


def main() -> int:
    if len(sys.argv) < 2:
        print(
            "usage: ann_recall.py SF_DIR [QUERY ...]",
            file=sys.stderr,
        )
        return 2
    sf_dir = sys.argv[1]
    names = sys.argv[2:] or ["sim_ann_lsh_multiprobe"]
    n, truth = ground_truth(sf_dir)

    from canadiannewsdatapipeline_spark.queries import QUERIES
    from canadiannewsdatapipeline_spark.session import get_spark

    spark = get_spark("ann-recall")
    for name in names:
        got = {
            (r.id_a, r.id_b)
            for r in QUERIES[name].fn(spark, sf_dir).select("id_a", "id_b").collect()
        }
        print(
            json.dumps(
                {
                    "query": name,
                    "n_vectors": n,
                    "true_pairs": len(truth),
                    "returned": len(got),
                    "true_returned": len(got & truth),
                    "recall": round(len(got & truth) / max(len(truth), 1), 4),
                    "false_positives": len(got - truth),
                }
            )
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
