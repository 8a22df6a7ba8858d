"""Unit tests for the round-2 corpus-construction operators: connected
components / dup clustering, PII scrub, repetition features, embedding
quantization."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from canadiannewsdatapipeline_spark.operators.cluster import (
    connected_components,
    dup_clusters,
)
from canadiannewsdatapipeline_spark.operators.embeddings import (
    normalized,
    quantize_stats,
)
from canadiannewsdatapipeline_spark.operators.textstats import repetition_features
from canadiannewsdatapipeline_spark.functions.pii import count_pii, scrub_pii


def _nodes(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


def _pairs(spark, pairs):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs] or [(None, None)], "id_a long, id_b long"
    ).filter(F.col("id_a").isNotNull())


def test_cc_chain_converges_to_min(spark):
    # Pathological 16-hop chain: path-halving must still reach the
    # exact fixpoint (every node labelled 0).
    n = 17
    lab = connected_components(
        _nodes(spark, range(n)), _pairs(spark, [(i, i + 1) for i in range(n - 1)])
    )
    got = {r["id"]: r["lab"] for r in lab.collect()}
    assert got == {i: 0 for i in range(n)}


def test_cc_components_and_singletons(spark):
    # Two components {1,2,3,9} (via 9-1 edge given out of order) and
    # {5,6}; 4 and 7 isolated.
    lab = connected_components(
        _nodes(spark, [1, 2, 3, 4, 5, 6, 7, 9]),
        _pairs(spark, [(2, 3), (9, 1), (1, 2), (5, 6)]),
    )
    got = {r["id"]: r["lab"] for r in lab.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 9: 1, 4: 4, 5: 5, 6: 5, 7: 7}


def test_cc_no_edges_converges_in_round_one(spark):
    # Already-converged graph: the changed-count aggregate (r13 form —
    # each round carries the incoming label as lab0 and counts
    # lab != lab0) must detect the fixpoint immediately and keep
    # lab = id.
    ids = [3, 7, 42, 9001]
    lab = connected_components(_nodes(spark, ids), _pairs(spark, []))
    got = {r["id"]: r["lab"] for r in lab.collect()}
    assert got == {i: i for i in ids}


def test_cc_empty_nodes_returns_empty(spark):
    # r12 advice: the old sum-of-labels convergence check collected a
    # NULL on an empty frame and raised TypeError. count(CASE WHEN
    # changed) is 0 on empty input, so the loop must exit cleanly.
    lab = connected_components(_nodes(spark, []), _pairs(spark, []))
    assert lab.collect() == []
    assert lab.columns == ["id", "lab"]


def test_cc_random_graph_matches_union_find(spark):
    # 5000-node random sparse graph (pairs + chains + a few bigger
    # blobs — the dup-graph shape): the seeded/changed-count fixpoint
    # must agree exactly with a plain union-find oracle.
    import random

    rng = random.Random(13)
    n = 5000
    ids = list(range(0, 3 * n, 3))  # non-contiguous ids
    edges = []
    # random pairs over the tail half only, disjoint from the chains:
    # chains overlapping a near-critical random graph compose into
    # diameter-~60 structures that need >25 rounds (min-label + path
    # halving converges in ~diameter/2, measured in the pure-python
    # simulation of this exact loop — see cluster.py docstring), which
    # is a different regime than dup graphs and is covered by the
    # max_iter bound, not by this parity test.
    tail = ids[1000:]
    for _ in range(1500):
        a, b = rng.sample(tail, 2)
        edges.append((a, b))
    for start in range(0, 900, 90):  # nine 30-hop chains
        chain = ids[start : start + 30]
        edges += list(zip(chain, chain[1:]))

    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # fully compress, then relabel every root to the component MIN id
    # (union by min above already keeps roots minimal)
    want = {i: find(i) for i in ids}

    lab = connected_components(_nodes(spark, ids), _pairs(spark, edges))
    got = {r["id"]: r["lab"] for r in lab.collect()}
    assert got == want


def test_dup_clusters_keep_one(spark):
    docs = spark.createDataFrame([(i, "x") for i in [10, 11, 12, 20]], "doc_id long, text string")
    out = dup_clusters(docs, _pairs(spark, [(10, 11), (11, 12)]), "doc_id")
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[10]["cluster_id"] == 10 and rows[10]["keep"]
    assert rows[11]["cluster_id"] == 10 and not rows[11]["keep"]
    assert rows[12]["cluster_size"] == 3
    assert rows[20]["keep"] and rows[20]["cluster_size"] == 1
    # keep-one invariant: exactly one keeper per cluster
    assert out.filter("keep").groupBy("cluster_id").count().filter("count != 1").count() == 0


@pytest.mark.parametrize(
    "text,exp_counts,exp_clean",
    [
        (
            "mail a@b.co or (555) 123-4567 at 10.0.0.1 end",
            (1, 1, 1),
            "mail <EMAIL> or <PHONE> at <IP> end",
        ),
        ("no pii here 1.2 v3", (0, 0, 0), "no pii here 1.2 v3"),
        (
            "two a.b-c@x.org d@e.io and 192.168.001.255",
            (2, 0, 1),
            "two <EMAIL> <EMAIL> and <IP>",
        ),
    ],
)
def test_pii_scrub(spark, text, exp_counts, exp_clean):
    df = spark.createDataFrame([(text,)], "t string")
    ne, np_, ni = count_pii(F.col("t"))
    row = df.select(
        ne.alias("e"), np_.alias("p"), ni.alias("i"), scrub_pii(F.col("t")).alias("c")
    ).collect()[0]
    assert (row["e"], row["p"], row["i"]) == exp_counts
    assert row["c"] == exp_clean


def test_repetition_features(spark):
    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),  # one token repeated 4x
            (2, "a b c d e"),  # no repetition
            (3, "x"),  # too short for 2/3-grams
        ],
        "doc_id long, text string",
    )
    got = {r["id"]: r for r in repetition_features(docs, "text", "doc_id").collect()}
    assert got[1]["n_tokens"] == 4
    assert got[1]["top_token_frac"] == 1.0
    assert got[1]["top_2gram_frac"] == 1.0  # 'spam spam' x3
    assert got[1]["dup_3gram_frac"] == pytest.approx(0.5)  # 2 grams, 1 distinct
    assert got[2]["top_token_frac"] == pytest.approx(0.2)
    assert got[2]["dup_3gram_frac"] == 0.0
    assert got[3]["n_tokens"] == 1 and got[3]["top_2gram_frac"] == 0.0


def test_quantize_stats_known_vector(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r["id"]: r for r in quantize_stats(df, "vec_id", "embedding").collect()}
    r1 = got[1]
    assert r1["dim"] == 4
    # scale = 1/127; q = [127, -64 (63.5 rounds away from zero), 32, 0]
    assert r1["q_sum"] == 127 - 64 + 32
    assert r1["q_l1"] == 127 + 64 + 32
    assert r1["n_sat"] == 1
    assert r1["l2_norm"] == pytest.approx((1 + 0.25 + 0.0625) ** 0.5, abs=1e-6)
    r2 = got[2]
    assert r2["scale"] == 0.0 and r2["q_sum"] == 0 and r2["n_sat"] == 0


def test_normalized_unit_norm(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    got = {r["id"]: r["unit"] for r in normalized(df, "vec_id", "embedding").collect()}
    assert got[1] == pytest.approx([0.6, 0.8])
    assert got[2] == [0.0, 0.0]


def test_lsh_verify_strategies_equivalent(spark):
    # the array (collect_set + array_intersect) and join ((id, h)
    # equi-join) verify paths must produce identical verified pairs
    from canadiannewsdatapipeline_spark.operators.dedup import lsh_verified_pairs
    from canadiannewsdatapipeline_spark.sources.registry import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    arr = lsh_verified_pairs(
        docs, "text", "doc_id", threshold=0.5, verify_strategy="array"
    )
    join = lsh_verified_pairs(
        docs, "text", "doc_id", threshold=0.5, verify_strategy="join"
    )
    ra = {(r.id_a, r.id_b, round(r.jaccard, 9)) for r in arr.collect()}
    rj = {(r.id_a, r.id_b, round(r.jaccard, 9)) for r in join.collect()}
    assert ra == rj and len(ra) > 0


def test_oracle_series_caps_hold_for_test_corpora():
    """Several DuckDB oracles expand tokens/chunks via a bounded
    generate_series (1..200 shingle positions; 0..40 chunk indices)
    while the Spark sides are unbounded (or clamped to the same bound).
    The pair is only equivalent while the corpus stays under the caps —
    fail loudly with the observed maxima if the driver ever regenerates
    testdata with longer documents."""
    import duckdb

    from canadiannewsdatapipeline_spark.queries.corpus import (
        _CHUNK_MAX_IDX,
        _CHUNK_STEP,
    )

    con = duckdb.connect()
    for sf in ("0.001", "0.01"):
        max_toks, max_len = con.execute(
            f"""
            SELECT MAX(len(string_split(lower(text), ' '))), MAX(length(text))
            FROM '/root/testdata/sf{sf}/documents.parquet'
            """
        ).fetchone()
        assert max_toks <= 200, (
            f"sf{sf}: doc with {max_toks} tokens exceeds the 200-position "
            "generate_series cap in the shingle oracles"
        )
        assert max_len <= (_CHUNK_MAX_IDX + 1) * _CHUNK_STEP, (
            f"sf{sf}: doc with {max_len} chars exceeds the chunk-index cap "
            f"({_CHUNK_MAX_IDX})"
        )
