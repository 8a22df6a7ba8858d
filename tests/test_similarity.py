"""Recall properties of the ANN scale paths vs the exact baseline.

The oracle corpus proves hash parity; these tests pin the *quality*
contract: LSH/IVF candidates verified with the exact cosine can only
return true pairs (precision 1.0), and multi-table amplification must
recall strictly more than a single conjunctive table.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from canadiannewsdatapipeline_spark.operators.similarity import (
    ann_ivf_pairs,
    ann_lsh_multitable_pairs,
    ann_lsh_pairs,
    cosine_pairs,
)
from canadiannewsdatapipeline_spark.sources.registry import load_table

SF_DIR = "/root/testdata/sf0.001"
THRESHOLD = 0.4


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def truth(emb):
    rows = (
        cosine_pairs(emb, "vec_id", "embedding", THRESHOLD)
        .select("id_a", "id_b")
        .collect()
    )
    return {tuple(r) for r in rows}


def _pairs(df):
    return {tuple(r) for r in df.select("id_a", "id_b").collect()}


def test_lsh_multitable_perfect_precision_and_amplified_recall(emb, truth):
    single = _pairs(ann_lsh_pairs(emb, "vec_id", "embedding", THRESHOLD))
    multi = _pairs(
        ann_lsh_multitable_pairs(
            emb, "vec_id", "embedding", THRESHOLD, n_tables=12, n_planes=5
        )
    )
    assert multi <= truth  # exact verify => no false positives
    assert single <= truth
    assert len(multi) > len(single)  # OR-of-ANDs amplification
    assert len(multi) >= len(truth) // 2  # the whole point of L tables


def test_ivf_multiprobe_perfect_precision(emb, truth):
    got = _pairs(
        ann_ivf_pairs(
            emb,
            "vec_id",
            "embedding",
            THRESHOLD,
            centroid_filter=F.col("vec_id") < 32,
            n_probe=4,
        )
    )
    assert got <= truth
    assert len(got) >= len(truth) // 2
