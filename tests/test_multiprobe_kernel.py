"""Spark-free invariants for the multi-probe signature kernel.

The end-to-end contract (recall/precision vs the exact tier, cascade
equivalence, DuckDB oracle parity) is pinned in test_similarity.py and
test_oracle_parity.py; these tests pin the pure-Python pieces the
pipeline and its oracle both derive from, so a refactor that silently
changes subset ranking, probe-mask enumeration, or word packing fails
here in milliseconds instead of as an opaque oracle hash mismatch.
"""

import hashlib

import numpy as np
import pandas as pd

from canadiannewsdatapipeline_spark.operators.similarity import (
    _WORD_BITS,
    _mp_signature_gen,
    _pool_subsets,
    _probe_masks,
)

POOL, N_BITS, N_TABLES, DIM = 252, 12, 160, 64


def test_probe_mask_enumeration():
    r1 = _probe_masks(N_BITS, 1)
    # zero mask + one per bit flip, all distinct, all within bucket width
    assert r1[0] == 0
    assert len(r1) == 1 + N_BITS == len(set(r1))
    assert all(0 <= m < (1 << N_BITS) for m in r1)
    assert sorted(bin(m).count("1") for m in r1) == [0] + [1] * N_BITS
    r2 = _probe_masks(N_BITS, 2)
    assert len(r2) == 1 + N_BITS + N_BITS * (N_BITS - 1) // 2 == len(set(r2))
    assert max(bin(m).count("1") for m in r2) == 2


def test_pool_subsets_are_valid_deterministic_and_md5_ranked():
    subs = _pool_subsets(POOL, N_BITS, N_TABLES)
    assert len(subs) == N_TABLES
    for t, s in enumerate(subs):
        assert len(s) == len(set(s)) == N_BITS
        assert all(0 <= j < POOL for j in s)
        # the subset is exactly the n_bits pool indices with the
        # smallest md5("sub:t:j") hex strings — the oracle's
        # ROW_NUMBER derivation depends on this exact ordering
        ranked = sorted(
            range(POOL),
            key=lambda j: (hashlib.md5(f"sub:{t}:{j}".encode()).hexdigest(), j),
        )[:N_BITS]
        assert s == ranked
    # derivation is pure: a second call is bit-identical
    assert subs == _pool_subsets(POOL, N_BITS, N_TABLES)
    # tables must differ or the pool buys no amplification
    assert len({tuple(s) for s in subs}) == N_TABLES


def test_signature_words_and_buckets_pack_the_same_sign_bits():
    gen = _mp_signature_gen(POOL, N_BITS, N_TABLES, DIM)
    rng = np.random.default_rng(7)
    n = 50
    vecs = rng.normal(size=(n, DIM)).astype(np.float32)
    pdf = pd.DataFrame({"id": np.arange(n), "v": list(vecs)})
    out = pd.concat(list(gen(iter([pdf]))), ignore_index=True)
    assert list(out["id"]) == list(range(n))

    # reference sign bits straight from the published plane formula
    planes = np.array(
        [
            [
                (ord(hashlib.md5(f"mp:{j}:{c}".encode()).hexdigest()[0]) % 7) - 3
                for c in range(DIM)
            ]
            for j in range(POOL)
        ],
        dtype=np.float64,
    )
    bits = (np.round(vecs.astype(np.float64) @ planes.T, 6) >= 0).astype(int)

    n_words = POOL // _WORD_BITS
    for i in range(n):
        # words: pool bit m*63+b sits at weight 2^(62-b) of word m
        for m in range(n_words):
            expect = 0
            for b in range(_WORD_BITS):
                expect = expect * 2 + int(bits[i, m * _WORD_BITS + b])
            assert int(out[f"w{m}"][i]) == expect
            assert expect >= 0  # 63-bit packing never touches the sign bit
    # buckets: table t packs its subset's bits first-bit-most-significant
    subs = _pool_subsets(POOL, N_BITS, N_TABLES)
    for i in range(0, n, 10):
        bks = out["bk"][i]
        assert len(bks) == N_TABLES
        for t in (0, 1, N_TABLES - 1):
            expect = 0
            for j in subs[t]:
                expect = expect * 2 + int(bits[i, j])
            assert int(bks[t]) == expect


def test_signature_kernel_nan_dot_sets_bit_like_spark():
    """r11 advice: Spark SQL orders NaN above every value, so the fold
    form's `dot >= 0` is TRUE on a NaN dot. The kernel must OR-in
    isnan to stay bit-identical — a vector with a NaN element makes
    every plane dot NaN, so all bits are 1 in both engines."""
    gen = _mp_signature_gen(POOL, N_BITS, 4, DIM)
    v = np.ones(DIM, dtype=np.float64)
    v[7] = np.nan
    pdf = pd.DataFrame({"id": [1], "v": [v]})
    out = pd.concat(list(gen(iter([pdf]))), ignore_index=True)
    n_words = POOL // _WORD_BITS
    for m in range(n_words):
        assert int(out[f"w{m}"][0]) == (1 << _WORD_BITS) - 1  # all 63 bits
    assert all(int(b) == (1 << N_BITS) - 1 for b in out["bk"][0])


def test_signature_kernel_skips_empty_batches():
    gen = _mp_signature_gen(POOL, N_BITS, 4, DIM)
    empty = pd.DataFrame({"id": [], "v": []})
    assert list(gen(iter([empty]))) == []
