"""Deterministic distributed serial-id assignment (r10 verdict #1).

The reference's raw_news primary key is a Postgres SERIAL
(init_db.py:18) feeding transformed.sql's unique test, so the engine
needs ids that are (a) dense 1..N in the global sort order —
deterministic across reruns so goldens and oracles agree (SURVEY.md
§7.4 item 3 chose row_number over monotonically_increasing_id for
exactly that) — and (b) assignable WITHOUT a global single-partition
window. The previous form, ``row_number().over(Window.orderBy(...))``
with no partitionBy, moves the ENTIRE ingest batch through one
partition (Spark's ``WindowExec: No Partition Defined`` warning): fine
at the reference's ~90 rows/run, a serializing funnel on a 100 TB
backfill.

This operator keeps the id contract bit-for-bit and distributes the
work as a three-phase plan, all linear, none single-partition:

1. **Boundary sample** (two tiny jobs: a count + a seeded key sample,
   collected to the driver — a few KB). The sampled keys become
   literal range boundaries; bucket(row) = #{boundaries <= key} is
   then a PURE FUNCTION of the row, so every downstream job re-derives
   the identical bucketing on recompute — no persist is needed for
   determinism, unlike ``repartitionByRange`` whose boundary sampling
   re-seeds per action. Balance (not correctness) depends on the
   sample: ids equal the global rank for ANY boundary set, because
   ``key >= boundary`` bucketing is order-consistent — every row of
   bucket b sorts before every row of bucket b+1.
2. **Per-bucket counts** (one map-side-combined aggregate job; the
   collect is one long per bucket). Driver-side cumulative sums give
   each bucket's id offset.
3. **Within-bucket row_number + offset** — the returned lazy plan.
   The window partitions by the bucket, so the sort parallelizes
   across buckets and the plan contains no SinglePartition exchange
   (plan-asserted in tests/test_serial_ids.py).

The input is persisted for the operator's lifetime (MEMORY_AND_DISK;
ContextCleaner reclaims it once the result is unreferenced): the
offsets are only correct if the counts job and the final pass see the
SAME rows, and an ingest input behind a non-deterministic source (a
live Fetcher) could otherwise drift between the internal jobs and
the returned plan — and the persist also stops the upstream lineage
(fetch -> parse -> validate) from executing once per internal job.
The pure-function bucketing remains the second line of defense: for
deterministic inputs a cache-evicted partition recomputes into the
identical bucket.

Comparison semantics: buckets compare ``struct(sort_cols) >=
struct(literals)``. Spark's struct ordering is lexicographic with
interior NULLs ordered first — identical to ``Window.orderBy``'s
default asc_nulls_first — so NULL sort-key values bucket consistently
with the order the ids rank (verified empirically + pinned in tests).

Determinism contract: bit-identical to the global ``row_number`` for
UNIQUE sort keys (the pipeline's (source_name, url, title, author) is
unique per record); tied keys order arbitrarily within the tie in both
forms. Ids are INT for schema parity with the reference's SERIAL —
the same 2^31 ceiling Postgres has.

Cost disclosure: phases 1-2 RUN three small jobs at plan-construction
time (the same disclosed eagerness class as the multiprobe's exact
count — linear scans, trivial next to the ingest write they feed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ~20 sampled keys per requested bucket: enough that boundaries
# balance bucket sizes within a small factor (load balance only —
# ids never depend on the sample), tiny to collect.
_BOUNDARY_OVERSAMPLE = 20

# Don't shatter small batches across hundreds of near-empty buckets:
# one bucket per this many rows, capped by the session's shuffle
# partitions. At ingest scale the cap binds; at golden-test scale a
# 3-row batch gets one bucket (physically the old plan, minus the
# global window).
_MIN_ROWS_PER_BUCKET = 1000


def assign_serial_ids(
    df: DataFrame,
    sort_cols: list[str],
    id_col: str = "id",
    n_buckets: int | None = None,
) -> DataFrame:
    """Append ``id_col`` = the 1-based global rank of each row under
    ``ORDER BY sort_cols`` (asc, nulls first) — the distributed,
    recompute-deterministic replacement for an unpartitioned
    ``row_number()`` window. See the module docstring for the
    three-phase shape and the determinism contract."""
    if not sort_cols:
        raise ValueError("sort_cols must be non-empty")
    from pyspark.storagelevel import StorageLevel

    spark = df.sparkSession
    # one pinned snapshot for the internal jobs AND the returned plan
    # (see the module docstring); ContextCleaner unpersists it once
    # the result is unreferenced
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    key = F.struct(*[F.col(c).alias(c) for c in sort_cols])
    total = df.count()
    if total > 2**31 - 1:
        # the id is INT for schema parity with the reference's SERIAL;
        # Spark's non-ANSI long->int cast would WRAP past the ceiling
        # (duplicate/negative ids) where Postgres errors — fail fast
        # with the count already in hand
        raise ValueError(
            f"assign_serial_ids: {total} rows exceed the INT serial-id "
            "ceiling (2^31-1); widen the id type deliberately instead "
            "of wrapping"
        )
    if n_buckets is None:
        # default: one bucket per _MIN_ROWS_PER_BUCKET rows, capped at
        # the session's shuffle parallelism. An EXPLICIT n_buckets is
        # honored exactly (the caller knows the batch) — the clamp
        # would otherwise fold a small test batch to one constant
        # bucket and silently reintroduce the unpartitioned window.
        n_buckets = max(
            1,
            min(
                int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
                -(-total // _MIN_ROWS_PER_BUCKET),
            ),
        )
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1 (got {n_buckets})")

    key_fields = df.select(
        *[F.col(c).alias(c) for c in sort_cols]
    ).schema.fields

    def lit_key(row) -> F.Column:
        # literal struct boundary; fields aliased + cast so both sides
        # of the comparison carry the identical struct type
        return F.struct(
            *[
                F.lit(row[i]).cast(f.dataType).alias(f.name)
                for i, f in enumerate(key_fields)
            ]
        )

    bounds = []
    if n_buckets > 1:
        frac = min(1.0, (_BOUNDARY_OVERSAMPLE * n_buckets) / max(total, 1))
        samp = (
            df.select(key.alias("k"))
            .sample(False, frac, seed=42)
            .orderBy("k")  # Spark-side sort: driver can't order NULLs
            .collect()
        )
        seen = set()
        for i in sorted(
            {(j * len(samp)) // n_buckets for j in range(1, n_buckets)}
        ) if samp else []:  # an unlucky empty sample => one bucket
            b = samp[i]["k"]
            t = tuple(b)
            if t not in seen:  # duplicate splitters collapse to one
                seen.add(t)
                bounds.append(b)

    def bucket_expr(lo: int, hi: int) -> F.Column:
        """Bucket index for keys known to fall in [lo, hi] — a
        binary-search CASE tree over the boundary literals. bounds[i]
        is the lower edge of bucket i+1, so bucket(row) = #{bounds <=
        key}; the tree evaluates ~log2(n_buckets) struct compares per
        row where a linear when-chain would average n_buckets/2 —
        this expression runs in BOTH downstream scans (the counts job
        and the returned plan), on every row of the batch."""
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi + 1) // 2  # key >= bounds[mid-1] => bucket >= mid
        return (
            F.when(key >= lit_key(bounds[mid - 1]), bucket_expr(mid, hi))
            .otherwise(bucket_expr(lo, mid - 1))
        )

    tagged = df.withColumn(
        "_sid_bucket", bucket_expr(0, len(bounds)).cast("int")
    )

    counts = {
        r["_sid_bucket"]: r["count"]
        for r in tagged.groupBy("_sid_bucket").count().collect()
    }
    offsets, running = [], 0
    for b in range(len(bounds) + 1):
        offsets.append((b, running))
        running += counts.get(b, 0)
    offsets_df = spark.createDataFrame(
        offsets, "_sid_bucket int, _sid_offset long"
    )

    w = Window.partitionBy("_sid_bucket").orderBy(
        *[F.col(c) for c in sort_cols]
    )
    return (
        tagged.join(F.broadcast(offsets_df), "_sid_bucket")
        .withColumn(
            id_col,
            (F.col("_sid_offset") + F.row_number().over(w)).cast("int"),
        )
        .drop("_sid_bucket", "_sid_offset")
    )
