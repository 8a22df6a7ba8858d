"""Planted-pair recall at the PRODUCTION near-dup threshold (>= 0.85).

The fresh ladder can measure the production configs' cost but not
their recall: hash-fresh random 64-dim directions have pairwise
cosines concentrated near 0, so the >= 0.85 output is empty and any
config trivially "recalls" it. This script plants real near-dups:
every base vector gets one twin at a target cosine drawn uniformly
from [0.85, 0.98] (v2 = c*u + sqrt(1-c^2)*w with w a random unit
vector orthogonal to u, then scaled — the planted cosine is exact up
to float32 rounding), ground truth is exact numpy float64 over ALL
pairs (planted AND incidental), and each config's registered-operator
output is compared against it.

Configs measured side by side:
- prod-multitable: ann_lsh_multitable_pairs, L=8 x k=12 (the
  ladder's `ann_lsh_prod_thresh` row — superlinear at fresh-x100,
  137 s at 200k vectors: candidates are ~N^2 * 8/2^12).
- prod-multiprobe: ann_lsh_multiprobe_pairs, pool=252, k=16, L=16,
  r=1, H=70 (the scale path: 16-bit buckets cut random collisions
  16x vs 12-bit, radius-1 probes recover the boundary recall the
  deeper k loses, and the Hamming screen at 70 — boundary pairs
  expect 252*(31.8/180) ~= 45 +- 6, random pairs 126 +- 8 — passes
  essentially no random candidate to the exact fold).

Usage: python scripts/prod_recall.py [n_base] [seed]
Prints one JSON line per config: {"config", "n_vectors",
"true_pairs", "returned", "true_returned", "recall",
"false_positives"}. False positives are impossible by construction
(exact verify inside both operators) — printed so the claim is
checked, not assumed.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

THRESHOLD = 0.85
DIM = 64


def planted_corpus(n_base: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n_base, DIM))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    cos = rng.uniform(THRESHOLD, 0.98, size=n_base)
    w = rng.normal(size=(n_base, DIM))
    # orthogonalize w against each base vector, then mix to the target
    w -= (w * base).sum(1, keepdims=True) * base
    w /= np.linalg.norm(w, axis=1, keepdims=True)
    twins = cos[:, None] * base + np.sqrt(1.0 - cos**2)[:, None] * w
    scale = rng.uniform(0.5, 2.0, size=(2 * n_base, 1))  # cosine is scale-free
    return (np.vstack([base, twins]) * scale).astype(np.float32)


def ground_truth(vecs: np.ndarray) -> set[tuple[int, int]]:
    v = vecs.astype(np.float64)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    true_pairs: set[tuple[int, int]] = set()
    block = 4096
    n = len(v)
    for s in range(0, n, block):
        sims = v[s : s + block] @ v.T
        # same 4-dp rounding contract as the operators
        ia, ib = np.nonzero(np.round(sims, 4) >= THRESHOLD)
        for a, b in zip(ia + s, ib):
            if a < b:
                true_pairs.add((int(a), int(b)))
    return true_pairs


def main() -> int:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 11
    vecs = planted_corpus(n_base, seed)
    truth = ground_truth(vecs)

    from pyspark.sql import types as T

    from canadiannewsdatapipeline_spark.operators.similarity import (
        PROD_NEAR_DUP_MP,
        ann_lsh_multitable_pairs,
        prod_near_dup_pairs,
    )
    from canadiannewsdatapipeline_spark.session import get_spark

    spark = get_spark("prod-recall")
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    emb = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(vecs)], schema
    )

    configs = {
        "prod-multitable-8x12": lambda: ann_lsh_multitable_pairs(
            emb, "vec_id", "embedding", threshold=THRESHOLD, n_tables=8, n_planes=12
        ),
        # the library's named production preset — imported, not
        # restated, so this measurement can never drift from what
        # prod_near_dup_pairs actually ships
        "prod-multiprobe-k{n_bits}-L{n_tables}-r{probe_radius}-H{hamming_max}".format(
            **PROD_NEAR_DUP_MP
        ): lambda: prod_near_dup_pairs(emb, "vec_id", "embedding"),
    }
    for name, fn in configs.items():
        got = {
            (min(r.id_a, r.id_b), max(r.id_a, r.id_b)) for r in fn().collect()
        }
        print(
            json.dumps(
                {
                    "config": name,
                    "n_vectors": len(vecs),
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
