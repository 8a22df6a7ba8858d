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

from .spread import spread

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


def _shingles_expr(n: int):
    parts = ", ".join(f"t[j + {k}]" for k in range(n))
    return F.expr(
        f"transform(sequence(0, size(t) - {n}), j -> concat_ws(' ', {parts}))"
    )


def shingle_set(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    ``array_distinct`` dedups inside each document's array *before* the
    explode, so the output rows are already distinct (ids are unique
    upstream) — no cross-row ``distinct()``, which would be a full
    shuffle of arbitrary-length shingle strings for nothing."""
    t = tokens_col(text_col)
    return (
        df.select(F.col(id_col).alias("id"), t.alias("t"))
        .filter(F.size("t") >= n)
        .select("id", F.explode(F.array_distinct(_shingles_expr(n))).alias("shingle"))
    )


# 2^31 - 1 (Mersenne prime) — the universal-hash modulus. Products
# (1000003*11 + 1) * (M31 - 1) stay < 2^55, exact in bigint on both
# engines.
M31 = 2147483647


def shingle_hash_set(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """Distinct 31-bit shingle hashes per document: (id, h) with
    h = bigint(first 15 hex chars of md5(shingle)) mod M31.

    The expensive digest runs ONCE per shingle — the ``num_hashes``
    signature hashes derive from h by exact integer universal hashing
    (see ``_mh_min``) — and every downstream shuffle/join carries an
    8-byte key instead of an arbitrary-length n-gram string. The hash
    and dedup both happen inside the per-document array, so the first
    shuffle in any consumer is the signature aggregation itself.
    Cross-doc hash collisions (~n_shingles/2^31) are reproduced
    identically by the oracle (same md5-derived values)."""
    t = tokens_col(text_col)
    hashes = F.array_distinct(
        F.transform(
            _shingles_expr(n),
            lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")
            % M31,
        )
    )
    return (
        df.select(F.col(id_col).alias("id"), t.alias("t"))
        .filter(F.size("t") >= n)
        .select("id", F.explode(hashes).alias("h"))
    )


def jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """All document pairs with shingle-set Jaccard >= threshold.

    Exact (quadratic in colliding docs): the baseline near-dup oracle.
    Use minhash_lsh_candidates for the scale path and feed only its
    candidates through this verification.

    The shingle set feeds the sizes aggregate and both self-join
    branches — persisted so the explode runs once.
    """
    from pyspark.storagelevel import StorageLevel

    sh = shingle_set(df, text_col, id_col, n).persist(StorageLevel.MEMORY_AND_DISK)
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
    """Minhash aggregate i: MIN over the doc's shingle hashes of the
    universal hash ((1000003*i + 1)*h + i) mod M31.

    Pure bigint arithmetic off the single per-shingle digest — 12
    signatures cost 12 multiply-adds per row, not 12 md5s of the full
    n-gram text. Numeric (fixed-width) agg buffers keep the 12-way MIN
    inside HashAggregate; MIN over md5 *strings* silently degrades the
    stage to SortAggregate (variable-length buffers) with a
    per-partition sort over every shingle. Identical in any engine
    with exact 64-bit integer ops (products < 2^55)."""
    mult = 1000003 * i + 1
    return F.min((F.lit(mult) * F.col("h") + F.lit(i)) % M31).alias(f"mh{i}")


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, num_hashes: int = 12, n: int = 3
) -> DataFrame:
    """(id, hash_index, minhash) — minhash_i = MIN over the doc's
    31-bit shingle hashes of universal hash i (see ``_mh_min``).
    md5-seeded so any engine reproduces it.

    Computed as ``num_hashes`` MIN aggregates over a single shingle
    explode (wide form, then unpivoted): one shuffle, no x12 row
    multiplication — at 100 TB the explode factor is the difference
    between a pass and a blow-up."""
    sh = shingle_hash_set(df, text_col, id_col, n)
    wide = sh.groupBy("id").agg(*[_mh_min(i) for i in range(num_hashes)])
    stack_expr = ", ".join(f"{i}, mh{i}" for i in range(num_hashes))
    return wide.select(
        "id", F.expr(f"stack({num_hashes}, {stack_expr}) AS (i, mh)")
    )


def _token_key(t) -> "F.Column":
    """16-byte exact-dedup key: md5 of the space-joined token array.

    Tokens are ``[a-z]+`` runs (never contain spaces), so the join is
    injective on token arrays up to md5 collision — the same collision
    budget ``exact_dup_groups`` already accepts. Every downstream
    quantity of the near-dup pipelines (shingle hashes, signatures,
    band sigs, Jaccard) is a pure function of the token array, so two
    docs with equal keys are interchangeable everywhere below."""
    return F.md5(F.concat_ws(" ", t))


def _collapse_identical(df: DataFrame, text_col: str, id_col: str):
    """Exact-dedup cascade front end: ``(groups, mapping)``.

    - ``groups``: one row per DISTINCT token array — ``(tkey, rid,
      gsz, t)`` with rid = min member id (the representative) and gsz
      the member count. Built with groupBy/agg, NOT a window: partial
      aggregation collapses identical copies map-side, so the one
      shuffle that carries token arrays moves ~|distinct docs| rows
      regardless of the duplication factor (a K-fold-replicated corpus
      shuffles 1/K of itself). ``F.first(t)`` is value-deterministic —
      every row in a tkey group carries the identical array.
    - ``mapping``: narrow ``(mid, rid, gsz)`` member->representative
      mapping (ids + a 16-byte key only; the docs' text never rides
      this join).

    Both frames are persisted — groups feeds the shingle pipeline and
    the within-group expansion, mapping feeds two expansion joins.
    Cache lifecycle (corrected r12, r11 advice): Dataset persists
    register in the session CacheManager and are NOT ContextCleaner-
    reclaimed — unpersist/clearCache between repeated runs in one
    session. Tokenization runs twice (once per frame), map-side only."""
    from pyspark.storagelevel import StorageLevel

    t = tokens_col(text_col)
    # NOT spread (r12, measured): this cascade is exchange-dominated
    # cold — 8+ shuffles and four persisted frames over narrow keys —
    # so spreading the tokenize inputs ADDED wall (0.5x on
    # dedup_minhash_lsh / dedup_lsh_verified, cold interleaved A/B at
    # sf0.1); the per-row digest work here is one md5 per document,
    # not hundreds, and does not clear the spread bar
    keyed = df.select(F.col(id_col).alias("mid"), t.alias("t")).withColumn(
        "tkey", _token_key(F.col("t"))
    )
    groups = (
        keyed.groupBy("tkey")
        .agg(
            F.min("mid").alias("rid"),
            F.count(F.lit(1)).alias("gsz"),
            F.first("t").alias("t"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    mapping = (
        keyed.select("mid", "tkey")
        .join(groups.select("tkey", "rid", "gsz"), "tkey")
        .select("mid", "rid", "gsz")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    return groups, mapping


def _rep_shingle_hashes(groups: DataFrame, n: int) -> DataFrame:
    """``shingle_hash_set`` over the representatives' token arrays:
    (id=rid, gsz, h). gsz rides along (8 bytes/shingle row, map-side
    only) so the band clamp can weight representative rows by member
    count without a second join."""
    hashes = F.array_distinct(
        F.transform(
            _shingles_expr(n),
            lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")
            % M31,
        )
    )
    return (
        groups.select(F.col("rid").alias("id"), "gsz", "t")
        .filter(F.size("t") >= n)
        .select("id", "gsz", F.explode(hashes).alias("h"))
    )


def _band_stack_expr(num_hashes: int, rows_per_band: int) -> str:
    n_bands = num_hashes // rows_per_band
    band_exprs = ", ".join(
        f"{b}, concat_ws('|', "
        + ", ".join(f"mh{b * rows_per_band + r}" for r in range(rows_per_band))
        + ")"
        for b in range(n_bands)
    )
    return f"stack({n_bands}, {band_exprs}) AS (band, sig)"


def _clamp_bands(
    bands: DataFrame, max_band_freq: int | None, weighted: bool
) -> DataFrame:
    """Drop band signatures whose document frequency exceeds the skew
    clamp. ``weighted`` is the cascade form: each representative row
    counts ``gsz`` members, so the frequency equals what the flat
    (per-member) pipeline would have counted — clamp decisions are
    bit-identical."""
    if max_band_freq is None:
        return bands
    from pyspark.sql import Window

    one = F.sum("gsz") if weighted else F.count(F.lit(1))
    freq = one.over(Window.partitionBy("band", "sig"))
    return (
        bands.withColumn("_band_freq", freq)
        .filter(F.col("_band_freq") <= max_band_freq)
        .drop("_band_freq")
    )


def _expand_member_pairs(
    rep_pairs: DataFrame, mapping: DataFrame, value_col: str
) -> DataFrame:
    """Representative pairs -> member pairs: every member of group A x
    every member of group B, canonically ordered. Two narrow joins
    (ids + one value column); the quadratic-in-group-size blowup only
    happens here, in output rows, never in shingles/signatures."""
    ma = mapping.select(F.col("rid").alias("rid_a"), F.col("mid").alias("ma"))
    mb = mapping.select(F.col("rid").alias("rid_b"), F.col("mid").alias("mb"))
    return (
        rep_pairs.join(ma, "rid_a")
        .join(mb, "rid_b")
        .select(
            F.least("ma", "mb").alias("id_a"),
            F.greatest("ma", "mb").alias("id_b"),
            value_col,
        )
    )


def _within_group_pairs(mapping: DataFrame, rep_values: DataFrame) -> DataFrame:
    """All member pairs inside multi-member groups, carrying their
    representative's value row. ``rep_values`` (rid, <value>) must
    contain only reps that would self-collide (>= 1 surviving band) —
    the inner join drops groups whose rep was clamped out or has no
    shingles, exactly as the flat pipeline drops them."""
    m2 = mapping.filter(F.col("gsz") > 1)
    return (
        m2.select("rid", F.col("mid").alias("id_a"))
        .join(m2.select("rid", F.col("mid").alias("id_b")), "rid")
        .filter(F.col("id_a") < F.col("id_b"))
        .join(rep_values, "rid")
        .drop("rid")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 12,
    rows_per_band: int = 3,
    n: int = 3,
    max_band_freq: int | None = None,
    collapse_identical: bool = True,
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
    the self-join. Duplicate groups that large are still caught by
    exact dedup on the content hash; LSH only needs the *near*-dup
    tail. Default None = no clamp (exact oracle semantics).

    ``collapse_identical`` (default) is the exact-dedup cascade:
    identical documents (same token array) are collapsed to a min-id
    representative BEFORE shingling, the signature/banding pipeline
    runs over distinct docs only, and representative pairs expand back
    to member pairs at the end. Output-identical to the flat pipeline
    (``collapse_identical=False``, kept as the equivalence oracle):

    - members share their representative's shingle-hash set, hence its
      signatures, band sigs, and candidate partners;
    - the band clamp weights each representative row by group size, so
      frequencies equal the flat per-member counts;
    - within-group pairs always collide — they share every surviving
      band, so their n_shared_bands is the rep's surviving-band count,
      and groups whose rep lost every band (or has < n tokens) emit
      nothing, exactly like the flat pipeline.

    On a replicated corpus the shingle explode, signature agg, and
    banding join all scale with DISTINCT documents; only the output
    expansion is quadratic in group size (the operator's pair-list
    contract — hand consumers ``dedup_clusters`` for group-shaped
    output)."""
    if not collapse_identical:
        return _minhash_lsh_candidates_flat(
            df, text_col, id_col, num_hashes, rows_per_band, n, max_band_freq
        )
    from pyspark.storagelevel import StorageLevel

    groups, mapping = _collapse_identical(df, text_col, id_col)
    sh = _rep_shingle_hashes(groups, n)
    wide = sh.groupBy("id").agg(
        *[_mh_min(i) for i in range(num_hashes)],
        F.min("gsz").alias("gsz"),
    )
    bands = wide.select(
        "id", "gsz", F.expr(_band_stack_expr(num_hashes, rows_per_band))
    )
    bands = _clamp_bands(bands, max_band_freq, weighted=True).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    a = bands.select(F.col("id").alias("rid_a"), "band", "sig")
    b = bands.select(F.col("id").alias("rid_b"), "band", "sig")
    rep_pairs = (
        a.join(b, ["band", "sig"])
        .filter(F.col("rid_a") < F.col("rid_b"))
        .groupBy("rid_a", "rid_b")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )
    cross = _expand_member_pairs(rep_pairs, mapping, "n_shared_bands")
    surv = bands.groupBy(F.col("id").alias("rid")).agg(
        F.count(F.lit(1)).alias("n_shared_bands")
    )
    within = _within_group_pairs(mapping, surv).select(
        "id_a", "id_b", "n_shared_bands"
    )
    # disjoint by construction: cross pairs span two groups, within
    # pairs stay inside one — union needs no dedup
    return cross.unionByName(within)


def _minhash_lsh_candidates_flat(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 12,
    rows_per_band: int = 3,
    n: int = 3,
    max_band_freq: int | None = None,
) -> DataFrame:
    """Flat (per-member) pipeline — the cascade's equivalence oracle.

    The per-id signature frame is persisted: both sides of the banding
    self-join read it, and without the persist Spark recomputes the
    shingle explode + N-way MIN aggregation once per branch (~2x the
    query's cost — ReuseExchange does not fire across the stack
    unpivot)."""
    from pyspark.storagelevel import StorageLevel

    sh = shingle_hash_set(df, text_col, id_col, n)
    wide = (
        sh.groupBy("id")
        .agg(*[_mh_min(i) for i in range(num_hashes)])
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    bands = wide.select("id", F.expr(_band_stack_expr(num_hashes, rows_per_band)))
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
    verify_strategy: str = "array",
    collapse_identical: bool = True,
) -> DataFrame:
    """The production-shape near-dup pipeline: MinHash-LSH candidate
    generation followed by exact Jaccard verification of ONLY the
    candidates — never an all-pairs scan.

    Two verify strategies, same exact result:

    - ``"array"`` (default): the per-doc shingle-hash set rides along
      the signature aggregation as a ``collect_set`` column, so the
      WHOLE pipeline is one shuffle over the shingles; candidates then
      join the (small) per-doc row twice and the common count is a
      map-side ``array_intersect``. ~7x faster end-to-end than the
      join strategy at bench scale (one pass over the corpus, no
      shingle re-shuffle). The per-doc hash array must fit an agg
      buffer — fine for web/news documents (even 100 KB of text is
      ~20K x 8 B); cap pathological docs upstream if unbounded.
    - ``"join"``: fully streaming — each candidate pair joins its two
      shingle-hash sets via (id_a), then (id_b, h) equi-joins, never
      materializing a per-doc set. Use when single documents can be
      arbitrarily large.

    Jaccard is computed over the 31-bit hash sets; the oracle derives
    the same hashes, so collisions (~|shingles|/2^31) agree
    bit-for-bit. Candidate pairs with zero common shingles fall out of
    the inner join — identical to jaccard = 0 < threshold.

    ``collapse_identical`` (default) is the exact-dedup cascade —
    identical token arrays collapse to a min-id representative before
    shingling, only representatives are banded and verified, and
    verified pairs expand back to members (see
    ``minhash_lsh_candidates`` for the output-identity argument). The
    verified additions: a cross-group member pair's Jaccard IS its
    representatives' Jaccard (same hash sets), and a within-group
    pair's Jaccard is exactly 1.0 (n/(n+n-n) with n >= 1 distinct
    hashes — the flat pipeline computes the same double), emitted only
    for groups whose representative kept >= 1 band after the clamp,
    and only when 1.0 >= threshold.

    The signature aggregate is persisted (it feeds banding AND the
    verify lookups); the cache entry lives in the session CacheManager
    until explicitly unpersisted (not ContextCleaner-reclaimed — r11
    advice); on a 100 TB run swap the persist for a checkpoint to
    cluster storage (the same two-phase shape plans/runner.py uses).
    Shingle sizes ride along as one extra COUNT column instead of a
    second aggregation over the shingles.

    Exchange-count note (r7, measured — this is plan_audit's one
    exchange-count outlier, adjudicated NOT a defect): the static
    simple-mode explain shows 22 ``Exchange hashpartitioning`` lines,
    and that count is INVARIANT across num_hashes 32/64/128 — banding
    is one ``stack()`` projection, so bands add zero exchanges (no
    per-band unions exist in this pipeline). Most of the 22 are
    duplicate lineage re-prints: the four persisted frames (groups,
    mapping, signature aggregate, clamped bands) are each referenced
    2-4x and an unexecuted persisted reference re-prints its upstream
    exchanges; at runtime each computes once and later references are
    InMemoryTableScans (39 of them in the executed plan at sf0.001).
    Audits see ~64 whenever the shared cached subframes were already
    MATERIALIZED in the session — by executing this query, or merely
    by building ``dedup_clusters``, whose construction-time
    convergence loop executes them (reproduced: 22 in a fresh
    session, 64 right after ``dedup_clusters`` is built) — because
    each materialized cache prints as a finalized AdaptiveSparkPlan
    with both initial and final sections. Every exchange is keyed on
    ids / 16-byte token keys / (band, sig) — none grows with band
    count, text never shuffles."""
    if not collapse_identical:
        return _lsh_verified_pairs_flat(
            df, text_col, id_col, num_hashes, rows_per_band, n, threshold,
            max_band_freq, verify_strategy,
        )
    from pyspark.storagelevel import StorageLevel

    groups, mapping = _collapse_identical(df, text_col, id_col)
    sh = _rep_shingle_hashes(groups, n)
    if verify_strategy == "join":
        sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    extra = [] if verify_strategy == "join" else [F.collect_set("h").alias("hs")]
    wide = sh.groupBy("id").agg(
        *[_mh_min(i) for i in range(num_hashes)],
        F.count(F.lit(1)).alias("n_sh"),
        F.min("gsz").alias("gsz"),
        *extra,
    ).persist(StorageLevel.MEMORY_AND_DISK)
    bands = wide.select(
        "id", "gsz", F.expr(_band_stack_expr(num_hashes, rows_per_band))
    )
    bands = _clamp_bands(bands, max_band_freq, weighted=True).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    ba = bands.select(F.col("id").alias("id_a"), "band", "sig")
    bb = bands.select(F.col("id").alias("id_b"), "band", "sig")
    cand = (
        ba.join(bb, ["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    if verify_strategy == "array":
        wa = wide.select(
            F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"),
            F.col("hs").alias("hs_a"),
        )
        wb = wide.select(
            F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"),
            F.col("hs").alias("hs_b"),
        )
        n_common = F.size(F.array_intersect("hs_a", "hs_b"))
        jac = n_common.cast("double") / (
            F.col("n_a") + F.col("n_b") - n_common
        )
        rep_pairs = (
            cand.join(wa, "id_a")
            .join(wb, "id_b")
            .select(
                F.col("id_a").alias("rid_a"),
                F.col("id_b").alias("rid_b"),
                jac.alias("jaccard"),
            )
            .filter(F.col("jaccard") >= threshold)
        )
    else:
        a = sh.select(F.col("id").alias("id_a"), "h")
        b = sh.select(F.col("id").alias("id_b"), "h")
        common = (
            cand.join(a, "id_a")
            .join(b, ["id_b", "h"])
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
        sa = wide.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
        sb = wide.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
        jac = F.col("n_common").cast("double") / (
            F.col("n_a") + F.col("n_b") - F.col("n_common")
        )
        rep_pairs = (
            common.join(sa, "id_a")
            .join(sb, "id_b")
            .select(
                F.col("id_a").alias("rid_a"),
                F.col("id_b").alias("rid_b"),
                jac.alias("jaccard"),
            )
            .filter(F.col("jaccard") >= threshold)
        )
    cross = _expand_member_pairs(rep_pairs, mapping, "jaccard")
    # a rep with >= 1 surviving band self-collides; its members' pairwise
    # Jaccard is exactly 1.0 (identical nonempty hash sets)
    surv = (
        bands.select(F.col("id").alias("rid"))
        .distinct()
        .withColumn("jaccard", F.lit(1.0))
        .filter(F.col("jaccard") >= threshold)
    )
    within = _within_group_pairs(mapping, surv).select("id_a", "id_b", "jaccard")
    return cross.unionByName(within)


def _lsh_verified_pairs_flat(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 12,
    rows_per_band: int = 3,
    n: int = 3,
    threshold: float = 0.5,
    max_band_freq: int | None = None,
    verify_strategy: str = "array",
) -> DataFrame:
    """Flat (per-member) pipeline — the cascade's equivalence oracle."""
    from pyspark.storagelevel import StorageLevel

    sh = shingle_hash_set(df, text_col, id_col, n)
    if verify_strategy == "join":
        sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    extra = [] if verify_strategy == "join" else [F.collect_set("h").alias("hs")]
    wide = sh.groupBy("id").agg(
        *[_mh_min(i) for i in range(num_hashes)],
        F.count(F.lit(1)).alias("n_sh"),
        *extra,
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
    if verify_strategy == "array":
        wa = wide.select(
            F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"),
            F.col("hs").alias("hs_a"),
        )
        wb = wide.select(
            F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"),
            F.col("hs").alias("hs_b"),
        )
        n_common = F.size(F.array_intersect("hs_a", "hs_b"))
        jac = n_common.cast("double") / (
            F.col("n_a") + F.col("n_b") - n_common
        )
        return (
            cand.join(wa, "id_a")
            .join(wb, "id_b")
            .select("id_a", "id_b", jac.alias("jaccard"))
            .filter(F.col("jaccard") >= threshold)
        )
    a = sh.select(F.col("id").alias("id_a"), "h")
    b = sh.select(F.col("id").alias("id_b"), "h")
    common = (
        cand.join(a, "id_a")
        .join(b, ["id_b", "h"])
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
    # spread (r12, guide §2.5): the vote stage below runs ``bits`` md5
    # digests per (id, token) row — compute-bound work whose input the
    # byte-based AQE coalescing collapses to one task after the
    # distinct's shuffle (measured 1.2x at sf0.1; the md5-to-bytes
    # ratio only grows with corpus scale)
    toks = spread(
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
