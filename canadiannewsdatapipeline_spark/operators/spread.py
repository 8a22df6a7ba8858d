"""Explicit compute-parallelism repartition for compute-bound stages.

Why this exists (r12 optimization round, guide §2.5/§2.2): AQE's
partition coalescing — and, before any shuffle, row-group-granular scan
splitting — size partitions by BYTES. That is right for shuffle- and
I/O-bound stages and wrong for the engine's handful of compute-bound
stages, where the work per row dwarfs the bytes per row:

- per-pair cosine folds downstream of a candidate/cross join
  (quadratic work rooted at a KB-sized vector table),
- interpreted higher-order-function fold stages (the sign-LSH bucket
  folds: ~n_tables x n_planes x dim lambda evaluations per row),
- md5-per-shingle / md5-per-(token, bit) explode stages (hundreds of
  digests per document row).

On byte-tiny inputs those stages collapse to ONE task and serialize a
32-core box (measured at sf0.1: dedup_embedding_cosine 19.9 s ->
0.8 s, the sim_ann_lsh verify pipeline 17.9 s -> 1.2 s, purely by
spreading). At production scale the same ratio holds in reverse: the
round-robin exchange this helper inserts moves each row once (linear,
a few hundred bytes), while the stage it feeds does 10-100x that work
per row — so the guard is cheap insurance everywhere and a 10x+ win
wherever layout or coalescing under-partitions a compute-bound stage.

The partition count comes from ``spark.sql.shuffle.partitions`` — the
session derives it from $SPARK_GRAFT_CPUS locally and clusters tune it
to cluster width — never a hard-coded constant, so the driver's
low-core bench leg and any real deployment stay honest. Explicit
``repartition(n, ...)`` is used deliberately: AQE does not coalesce
user-specified repartitions, which is exactly the point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, *by: str) -> DataFrame:
    """Repartition ``df`` to the session's configured shuffle
    parallelism — round-robin by default, hash on ``by`` columns when
    the downstream consumer needs co-location (e.g. an equi-join key
    plus a high-cardinality spreader column)."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(n, *by) if by else df.repartition(n)
