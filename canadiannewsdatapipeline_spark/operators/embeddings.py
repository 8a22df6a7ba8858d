"""Embedding-column utilities for training pipelines: L2 stats and
int8 quantization (the storage format ANN indexes and feature stores
actually ship at 100 TB — 4x smaller than float32).

Everything is higher-order array functions over `array<float>` —
JVM-side, no explode, no Python. One row in, one row out, so the ops
are embarrassingly parallel: no shuffle at any scale.

Cross-engine float discipline (see queries/core.py header): cast
float->double before arithmetic (exact), keep integer outputs exact,
and round any order-sensitive double sum (L2 norm) to 6 dp; the
per-element quantized values divide by a max-derived scale (max is
order-insensitive) so they are bit-stable without rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dsum(vec: Column, term) -> Column:
    """Exact-order sequential fold sum of term(x) over the array."""
    return F.aggregate(
        vec, F.lit(0.0), lambda acc, x: acc + term(x.cast("double"))
    )


def quantize_stats(
    df: DataFrame, id_col: str, vec_col: str, bits: int = 8
) -> DataFrame:
    """Per-vector quantization summary: (id, dim, l2_norm, scale,
    q_sum, q_l1, n_sat).

    Symmetric linear quantization: scale = max(|v|) / qmax with
    qmax = 2^(bits-1) - 1; q_i = round(v_i / scale) (zero vectors =>
    scale 0, all q_i = 0). `n_sat` counts saturated lanes (|q| =
    qmax) — the quantization-health metric. Integer outputs are exact;
    l2_norm/scale are rounded to 6 dp for cross-engine hashing.
    """
    qmax = (1 << (bits - 1)) - 1
    v = F.col(vec_col)
    absmax = F.aggregate(
        v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x.cast("double")))
    )
    scale = absmax / F.lit(float(qmax))
    q = F.when(scale == 0.0, F.transform(v, lambda x: F.lit(0).cast("long"))).otherwise(
        F.transform(v, lambda x: F.round(x.cast("double") / scale, 0).cast("long"))
    )
    qc = F.col("q")
    return df.select(
        F.col(id_col).alias("id"), v.alias("v"), q.alias("q"), scale.alias("s")
    ).select(
        "id",
        F.size("v").alias("dim"),
        F.round(F.sqrt(_dsum(F.col("v"), lambda d: d * d)), 6).alias("l2_norm"),
        F.round("s", 6).alias("scale"),
        F.aggregate(qc, F.lit(0).cast("long"), lambda a, x: a + x).alias("q_sum"),
        F.aggregate(qc, F.lit(0).cast("long"), lambda a, x: a + F.abs(x)).alias("q_l1"),
        F.size(F.filter(qc, lambda x: F.abs(x) == qmax)).alias("n_sat"),
    )


def normalized(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, unit) with unit = v / ||v||2 as array<double> (zero vectors
    pass through unchanged). Row-local, shuffle-free."""
    v = F.col(vec_col)
    n2 = _dsum(v, lambda d: d * d)
    unit = F.when(
        n2 == 0.0, F.transform(v, lambda x: x.cast("double"))
    ).otherwise(F.transform(v, lambda x: x.cast("double") / F.sqrt(n2)))
    return df.select(F.col(id_col).alias("id"), unit.alias("unit"))
