"""Build an adversarial copy of the test warehouse and (optionally)
run the full Spark-vs-DuckDB differential against it.

The driver regenerates the synthetic tables every round, so latent
tie-break nondeterminism only surfaces when the data happens to
contain the right collisions. This script injects them on purpose:

- events: exact duplicate (user_id, ts) pairs with distinct event_ids
  (window tiebreak stress), plus a user whose events all share one ts
- orders: duplicate o_totalprice within custkey/orderstatus (argmax /
  DISTINCT ON / mode ties)
- lineitem: rows tying on the (l_linenumber, l_extendedprice) dedup
  key within an order
- customer: duplicate c_acctbal within a nation (top-n / rank ties)
- documents: empty text, punctuation-only, single-token, exact
  duplicate bodies across new doc_ids (dedup-cluster stress)
- embeddings: the zero vector (norm-0 cosine), bit-identical vectors
  under distinct vec_ids (top-k similarity ties), constant vectors

Usage: python scripts/fuzz_testdata.py [out_dir]   (default
/tmp/fuzzdata) — then: python scripts/driver_sim.py /tmp/fuzzdata

A mismatch against the fuzzed warehouse means a query's determinism
contract has a hole the current round's data simply hasn't hit yet.

--shuffle-seed N additionally rewrites every table in seeded-random
row order. No registered query may depend on parquet file order:
Spark's multi-split scan and DuckDB's parallel scan already read in
different orders, but small tables often fit one split and hide an
under-specified tiebreak until the driver regenerates data. A
shuffled warehouse makes any order-dependence diverge immediately.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> int:
    args = sys.argv[1:]
    shuffle_seed = None
    if "--shuffle-seed" in args:
        i = args.index("--shuffle-seed")
        # same guard class as driver_sim --json (r7 advice): a
        # trailing flag or a non-numeric value gets a usage line,
        # not an IndexError/ValueError traceback
        if i + 1 >= len(args):
            print(
                "usage: fuzz_testdata.py OUT_DIR [--shuffle-seed S]"
                "  (--shuffle-seed requires a value in [-1, 1])",
                file=sys.stderr,
            )
            return 2
        try:
            shuffle_seed = float(args[i + 1])
        except ValueError:
            print(
                f"ERROR: --shuffle-seed must be a float, got "
                f"{args[i + 1]!r}",
                file=sys.stderr,
            )
            return 2
        del args[i : i + 2]
        # DuckDB setseed() only accepts [-1, 1] and fails with an
        # opaque error mid-COPY otherwise; reject bad seeds up front
        if not -1.0 <= shuffle_seed <= 1.0:
            print(
                f"ERROR: --shuffle-seed must be in [-1, 1] (DuckDB setseed "
                f"domain), got {shuffle_seed}",
                file=sys.stderr,
            )
            return 2
    out = args[0] if args else "/tmp/fuzzdata"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE TABLE {t} AS SELECT * FROM '{SRC}/{t}.parquet'")

    con.execute(
        """
        INSERT INTO events
        -- 40 users get an exact-duplicate-ts pair (distinct event_ids);
        -- user 1 additionally gets 5 events all at one instant
        SELECT event_id + 10000000, ts, user_id, event_type, value, props
        FROM events WHERE event_id % 97 = 0
        UNION ALL
        SELECT 20000000 + i, TIMESTAMP '2024-01-05 12:00:00', 1, 'click',
               42.0 + i, '{"k": 1}'
        FROM (SELECT unnest(generate_series(1, 5)) AS i)
        """
    )
    con.execute(
        """
        INSERT INTO orders
        SELECT o_orderkey + 10000000, o_custkey, o_orderstatus,
               o_totalprice,  -- duplicate price under a new orderkey
               o_orderdate, o_orderpriority
        FROM orders WHERE o_orderkey % 101 = 0
        """
    )
    con.execute(
        """
        INSERT INTO lineitem
        -- tie on the full (l_linenumber, l_extendedprice) dedup key
        -- within an order, differing only in non-projected columns
        SELECT l_orderkey, l_partkey + 1, l_suppkey, l_linenumber,
               l_quantity + 1, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM lineitem WHERE l_orderkey % 103 = 0
        """
    )
    con.execute(
        """
        INSERT INTO customer
        SELECT c_custkey + 10000000, c_name || '_twin', c_nationkey,
               c_acctbal, c_mktsegment
        FROM customer WHERE c_custkey % 47 = 0
        """
    )
    con.execute(
        """
        INSERT INTO documents VALUES
        (90000001, '', 'en', 'fuzz', 0),
        (90000002, '!!! ... ???', 'en', 'fuzz', 11),
        (90000003, 'word', 'en', 'fuzz', 4),
        (90000010, 'the quick brown fox jumps over the lazy dog again and again',
         'en', 'fuzz', 60),
        (90000011, 'the quick brown fox jumps over the lazy dog again and again',
         'en', 'fuzz', 60),
        (90000012, 'the quick brown fox jumps over the lazy dog again and again',
         'en', 'fuzz', 60)
        """
    )
    dim = con.execute(
        "SELECT len(embedding) FROM embeddings LIMIT 1"
    ).fetchone()[0]
    con.execute(
        f"""
        INSERT INTO embeddings
        SELECT 90000001, list_transform(generate_series(1, {dim}),
                                        i -> CAST(0.0 AS FLOAT)), 0
        UNION ALL
        SELECT 90000002, list_transform(generate_series(1, {dim}),
                                        i -> CAST(0.5 AS FLOAT)), 1
        UNION ALL
        SELECT 90000010 + v.i, e.embedding, e.label
        FROM (SELECT embedding, label FROM embeddings WHERE vec_id = 1) e,
             (SELECT unnest(generate_series(1, 3)) AS i) v
        """
    )

    for idx, t in enumerate(TABLES):
        order = ""
        if shuffle_seed is not None:
            # setseed makes random() reproducible; derive a distinct
            # per-table seed (folded back into setseed's [-1, 1]
            # domain) so each table draws its own random stream —
            # reseeding with the SAME value would replay one stream
            seed_t = ((shuffle_seed + 1.0 + idx * 0.0618) % 2.0) - 1.0
            con.execute(f"SELECT setseed({seed_t})")
            order = " ORDER BY random()"
        con.execute(f"COPY (SELECT * FROM {t}{order}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT COUNT(*) FROM {t}").fetchone()[0]
        print(f"{t}: {n} rows")
    mode = f" (row-shuffled, seed {shuffle_seed})" if shuffle_seed is not None else ""
    print(f"fuzz warehouse written to {out}{mode}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
