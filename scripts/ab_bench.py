"""Interleaved A/B micro-bench for optimization work (guide §1).

Builds two DataFrames (old/new) in ONE session, checks they produce
the identical row multiset, then times noop-sink runs interleaved
(A,B,A,B,...) so box-speed drift hits both arms equally. The box's
wall clock wanders up to 1.6x between sessions — only interleaved
same-session pairs are trustworthy for accept/reject decisions.

Usage: import from an experiment script; see scripts/exp_*.py.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame


def _noop(df: DataFrame) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def check_same_rows(a: DataFrame, b: DataFrame) -> None:
    """Fast parity gate: identical schema (names+types) and row multiset."""
    assert [(f.name, f.dataType) for f in a.schema.fields] == [
        (f.name, f.dataType) for f in b.schema.fields
    ], f"schema mismatch:\n{a.schema}\n{b.schema}"
    rows_a = sorted(map(repr, a.collect()))
    rows_b = sorted(map(repr, b.collect()))
    assert rows_a == rows_b, (
        f"row mismatch: {len(rows_a)} vs {len(rows_b)} rows; "
        f"first diff: {next((x for x, y in zip(rows_a, rows_b) if x != y), '?')}"
    )


def ab(
    name: str,
    old: DataFrame,
    new: DataFrame,
    trials: int = 5,
    check: bool = True,
) -> dict:
    if check:
        check_same_rows(old, new)
    spark = old.sparkSession
    # one untimed warmup each (codegen + page cache)
    _noop(old)
    _noop(new)
    ta, tb = [], []
    for i in range(trials):
        spark.sparkContext.setJobDescription(f"{name}: old trial {i}")
        ta.append(_noop(old))
        spark.sparkContext.setJobDescription(f"{name}: new trial {i}")
        tb.append(_noop(new))
    spark.sparkContext.setJobDescription(None)
    res = {
        "name": name,
        "old_min": round(min(ta), 3),
        "new_min": round(min(tb), 3),
        "old_all": [round(t, 3) for t in ta],
        "new_all": [round(t, 3) for t in tb],
        "speedup": round(min(ta) / min(tb), 2),
    }
    print(res)
    return res
