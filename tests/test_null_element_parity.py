"""Adversarial NULL-element embedding parity (round-6 ADVICE item).

No driver/fuzz generator currently emits embeddings with NULL
*elements*, so the graded differentials can never exercise the
divergence class the round-5 advice flagged: SQL SUM skips NULL terms
(a null-element vector would get sign bits from a PARTIAL dot in
DuckDB) while Spark's NULL-propagating ``F.aggregate`` fold and the
explicit ``~exists(isNull)`` filter drop such vectors entirely. The
oracle now carries an ``emb_ok`` guard CTE mirroring the Spark
filter (queries/llm.py); this test builds the warehouse the
generators never will — NULL vectors, NULL-element vectors, an
IDENTICAL null-element twin pair (the cascade's within-group path),
and a null-element NEAR-copy of a real vector (the row a partial dot
would have wrongly paired) — and runs the full registered-query vs
oracle differential on it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from canadiannewsdatapipeline_spark.queries import QUERIES

from test_oracle_parity import _multiset, duck_con_for_dir


@pytest.fixture(scope="module")
def null_wh(tmp_path_factory):
    rng = np.random.default_rng(7)
    base = rng.normal(size=(10, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows: list[list[float] | None] = [
        [float(x) for x in np.asarray(v, dtype=np.float32)] for v in base
    ]
    # near-dup twins of the first three bases (cos ~0.9): the output
    # must be NON-empty, so the test can't pass vacuously
    for i in range(3):
        w = rng.normal(size=64)
        w -= (w @ base[i]) * base[i]
        w /= np.linalg.norm(w)
        twin = 0.9 * base[i] + np.sqrt(1 - 0.81) * w
        rows.append([float(x) for x in twin.astype(np.float32)])
    # adversarial rows, all of which must vanish from BOTH engines:
    # a near-copy of base[0] with one NULL element (the partial-dot
    # trap: 63 matching terms would clear any threshold in DuckDB
    # without the guard), an identical PAIR of null-element vectors
    # (cascade within-group: self-cos must be NULL-dropped, not 1.0),
    # and a NULL vector
    trap = [float(x) for x in base[0].astype(np.float32)]
    trap[7] = None  # type: ignore[call-overload]
    dup = [float(x) for x in base[1].astype(np.float32)]
    dup[3] = None  # type: ignore[call-overload]
    rows += [trap, list(dup), list(dup), None]
    out = tmp_path_factory.mktemp("nullwh")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(len(rows)), pa.int64()),
                "embedding": pa.array(rows, pa.list_(pa.float32())),
            }
        ),
        out / "embeddings.parquet",
    )
    return str(out)


def test_multiprobe_null_element_parity(spark, null_wh):
    spec = QUERIES["sim_ann_lsh_multiprobe"]
    sdf = spec.fn(spark, null_wh)
    spark_rows = [tuple(r) for r in sdf.collect()]
    cols = [c.lower() for c in sdf.columns]

    con = duck_con_for_dir(null_wh, tables=("embeddings",))
    res = con.execute(spec.oracle)
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    assert sorted(cols) == sorted(duck_cols)
    s_order = sorted(range(len(cols)), key=lambda i: cols[i])
    d_order = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    assert _multiset(spark_rows, s_order) == _multiset(duck_rows, d_order)

    # not vacuous: the planted 0.9-cosine twins must be found...
    assert len(spark_rows) >= 3
    # ...and no adversarial id (10+3 = first trap index) may appear
    bad = {13, 14, 15, 16}
    ids = {r[0] for r in spark_rows} | {r[1] for r in spark_rows}
    assert not (ids & bad), ids & bad
