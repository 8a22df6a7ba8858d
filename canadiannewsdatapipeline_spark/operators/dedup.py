"""Large-scale deduplication operators (BASELINE.json extensions).

The reference only dedups exactly (content-hash surrogate keys +
latest-row windows, articles.sql:36-58); a 100 TB training-data
pipeline needs near-dup detection too. All operators here are pure
DataFrame compositions — no Python UDFs — so they whole-stage-codegen
and scale by partitioning:

- exact:   one groupBy on a 16-byte md5 — the cheapest possible dedup.
- n-gram Jaccard: shingle explode -> equi-join on shingle -> count
  ratio. The join key is the shingle string; at scale you'd hash it
  (md5) to bound shuffle width — semantics unchanged.
- MinHash+LSH: the scale path. Signatures are per-(doc, hash-index)
  MIN aggregates (map-side combinable); banding turns O(n^2) pair
  search into an equi-join on (band, band-signature).
- SimHash: 16-bit fingerprint via per-bit majority vote; near-dups
  collide on the fingerprint itself (a plain groupBy).

Hash functions are md5-derived so Spark and any SQL oracle agree
byte-for-byte (no engine-specific hash()).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_RE = "[a-z]+"


def tokens_col(text_col: str):
    return F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)


def normalize_text(c):
    """lower + collapse whitespace + trim — canonical form for exact dedup."""
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def exact_dup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup via md5 of normalized text: one row per content
    hash with the group size and the canonical (min-id) member."""
    return (
        df.select(
            F.md5(normalize_text(F.col(text_col))).alias("content_hash"),
            F.col(id_col),
        )
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min(id_col).alias("canonical_id"),
        )
    )


def shingle_set(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle)."""
    t = tokens_col(text_col)
    parts = ", ".join(f"t[j + {k}]" for k in range(n))
    shingles = F.expr(
        f"transform(sequence(0, size(t) - {n}), j -> concat_ws(' ', {parts}))"
    )
    return (
        df.select(F.col(id_col).alias("id"), t.alias("t"))
        .filter(F.size("t") >= n)
        .select("id", F.explode(F.array_distinct(shingles)).alias("shingle"))
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """All document pairs with shingle-set Jaccard >= threshold.

    Exact (quadratic in colliding docs): the baseline near-dup oracle.
    Use minhash_lsh_candidates for the scale path and feed only its
    candidates through this verification.
    """
    sh = shingle_set(df, text_col, id_col, n)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_common").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common")
    )
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def _mh_min(i: int):
    """Numeric 60-bit minhash aggregate: min over shingles of the first
    15 hex chars of md5(i ':' shingle) parsed as a bigint.

    Numeric (fixed-width) agg buffers keep the 12-way MIN inside
    HashAggregate — a MIN over md5 *strings* silently degrades the
    whole stage to SortAggregate (variable-length buffer), adding a
    per-partition sort over every shingle. The bigint form also cuts
    the shuffle row from 12x32-char strings to 12x8 bytes. Engine-
    portable: DuckDB CAST(concat('0x', substr(md5(..), 1, 15)) AS
    BIGINT) produces the identical value."""
    return F.min(
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle"))), 1, 15),
            16,
            10,
        ).cast("bigint")
    ).alias(f"mh{i}")


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, num_hashes: int = 12, n: int = 3
) -> DataFrame:
    """(id, hash_index, minhash) — minhash_i = MIN over shingles of a
    60-bit numeric hash of (i, shingle). md5-keyed so any engine
    reproduces it.

    Computed as ``num_hashes`` MIN aggregates over a single shingle
    explode (wide form, then unpivoted): one shuffle, no x12 row
    multiplication — at 100 TB the explode factor is the difference
    between a pass and a blow-up."""
    sh = shingle_set(df, text_col, id_col, n)
    wide = sh.groupBy("id").agg(*[_mh_min(i) for i in range(num_hashes)])
    stack_expr = ", ".join(f"{i}, mh{i}" for i in range(num_hashes))
    return wide.select(
        "id", F.expr(f"stack({num_hashes}, {stack_expr}) AS (i, mh)")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 12,
    rows_per_band: int = 3,
    n: int = 3,
    max_band_freq: int | None = None,
) -> DataFrame:
    """LSH banding: candidate pairs sharing >= 1 band signature, with
    the number of shared bands. Join key is (band, band_signature) —
    an equi-join, so AQE/skew handling applies; no quadratic scan.

    Band signatures come straight off the wide per-id signature row
    (single aggregation), unpivoted with ``stack`` — no second shuffle.

    ``max_band_freq`` is the 100 TB skew guard: a band signature shared
    by f docs fans out to f*(f-1)/2 candidate rows, so one boilerplate/
    empty-doc signature flooding a band turns the equi-join quadratic
    again. Signatures with frequency > max_band_freq are dropped before
    the self-join (a windowed count over the same (band, sig) hash
    partitioning the join needs — no extra join). Duplicate groups that
    large are still caught by exact dedup on the content hash; LSH only
    needs the *near*-dup tail. Default None = no clamp (exact oracle
    semantics)."""
    sh = shingle_set(df, text_col, id_col, n)
    wide = sh.groupBy("id").agg(*[_mh_min(i) for i in range(num_hashes)])
    n_bands = num_hashes // rows_per_band
    band_exprs = ", ".join(
        f"{b}, concat_ws('|', "
        + ", ".join(f"mh{b * rows_per_band + r}" for r in range(rows_per_band))
        + ")"
        for b in range(n_bands)
    )
    bands = wide.select(
        "id", F.expr(f"stack({n_bands}, {band_exprs}) AS (band, sig)")
    )
    if max_band_freq is not None:
        from pyspark.sql import Window

        freq = F.count(F.lit(1)).over(Window.partitionBy("band", "sig"))
        bands = (
            bands.withColumn("_band_freq", freq)
            .filter(F.col("_band_freq") <= max_band_freq)
            .drop("_band_freq")
        )
    a = bands.select(F.col("id").alias("id_a"), "band", "sig")
    b = bands.select(F.col("id").alias("id_b"), "band", "sig")
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def lsh_verified_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 12,
    rows_per_band: int = 3,
    n: int = 3,
    threshold: float = 0.5,
    max_band_freq: int | None = None,
) -> DataFrame:
    """The production-shape near-dup pipeline: MinHash-LSH candidate
    generation followed by exact Jaccard verification of ONLY the
    candidates — never an all-pairs scan.

    The verify stage joins each candidate pair to its two shingle sets
    via two equi-joins (id_a, then (id_b, shingle)), so the common-
    shingle count is linear in the candidates' shingles, not quadratic
    in the corpus. Candidate pairs with zero common shingles fall out
    of the inner join — identical to jaccard = 0 < threshold.

    The plan is a diamond (the shingle set feeds banding AND both
    verify joins; the per-doc aggregate feeds banding AND both size
    lookups), so both intermediates are persisted — without that Spark
    recomputes the shingle explode in 6 branches. Spark's
    ContextCleaner unpersists them once unreferenced; on a 100 TB run
    swap the persist for a checkpoint to cluster storage (the same
    two-phase shape plans/runner.py uses). Shingle sizes ride along in
    the signature aggregate (one extra COUNT column) instead of a
    second aggregation over the shingles."""
    from pyspark.storagelevel import StorageLevel

    sh = shingle_set(df, text_col, id_col, n).persist(StorageLevel.MEMORY_AND_DISK)
    wide = sh.groupBy("id").agg(
        *[_mh_min(i) for i in range(num_hashes)],
        F.count(F.lit(1)).alias("n_sh"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n_bands = num_hashes // rows_per_band
    band_exprs = ", ".join(
        f"{b}, concat_ws('|', "
        + ", ".join(f"mh{b * rows_per_band + r}" for r in range(rows_per_band))
        + ")"
        for b in range(n_bands)
    )
    bands = wide.select(
        "id", F.expr(f"stack({n_bands}, {band_exprs}) AS (band, sig)")
    )
    if max_band_freq is not None:
        from pyspark.sql import Window

        freq = F.count(F.lit(1)).over(Window.partitionBy("band", "sig"))
        bands = (
            bands.withColumn("_band_freq", freq)
            .filter(F.col("_band_freq") <= max_band_freq)
            .drop("_band_freq")
        )
    ba = bands.select(F.col("id").alias("id_a"), "band", "sig")
    bb = bands.select(F.col("id").alias("id_b"), "band", "sig")
    cand = (
        ba.join(bb, ["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    common = (
        cand.join(a, "id_a")
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = wide.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = wide.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_common").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common")
    )
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 16) -> DataFrame:
    """(id, simhash) — per-bit majority vote over distinct tokens;
    bit b of a token = parity of the first hex char of md5(b ':' tok)."""
    toks = (
        df.select(F.col(id_col).alias("id"), F.explode(tokens_col(text_col)).alias("tok"))
        .distinct()
    )
    votes = (
        toks.select("id", "tok", F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b"))
        .select(
            "id",
            "b",
            (
                F.ascii(
                    F.substring(
                        F.md5(F.concat(F.col("b").cast("string"), F.lit(":"), F.col("tok"))),
                        1,
                        1,
                    )
                )
                % 2
            ).alias("bit"),
        )
        .groupBy("id", "b")
        .agg(F.sum(F.col("bit") * 2 - 1).alias("vote"))
    )
    return votes.groupBy("id").agg(
        F.sum(
            F.when(F.col("vote") > 0, F.pow(F.lit(2), F.col("b")).cast("long")).otherwise(
                F.lit(0)
            )
        ).alias("simhash")
    )
