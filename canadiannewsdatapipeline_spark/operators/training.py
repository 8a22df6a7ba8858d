"""Training-corpus assembly operators — the steps between "clean
documents" and "training shards" in a large-scale LLM data pipeline:
deterministic splits, weighted source mixing, token-budget shard
packing, and eval-set contamination checks.

Everything is hash-deterministic (md5-derived, no RNG): a re-run on
the same corpus reproduces the same splits/samples byte-for-byte on
any engine — the property that makes 100 TB pipelines debuggable and
the DuckDB oracles exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _hash_pct(col) -> Column:
    """Deterministic 0-99 bucket from the first 8 md5 hex chars of the
    column's string form. Uniform, engine-portable (DuckDB:
    CAST(concat('0x', substr(md5(CAST(c AS VARCHAR)), 1, 8)) AS
    BIGINT) % 100)."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("bigint")
        % 100
    )


def train_val_test_split(
    df: DataFrame,
    id_col: str,
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Assign each row a deterministic split label by id hash. The
    split survives corpus growth: adding documents never moves an
    existing document to another split (hash depends only on the id),
    unlike randomSplit/sample which reshuffle everything on every run
    — at 100 TB, split stability is what keeps eval sets frozen."""
    pct = _hash_pct(F.col(id_col))
    return df.withColumn(
        "split",
        F.when(pct < train_pct, F.lit("train"))
        .when(pct < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def weighted_source_mix(
    df: DataFrame,
    id_col: str,
    source_col: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
) -> DataFrame:
    """Downsample each source to its mixing weight (0..1) with the
    same id-hash trick: keep a row iff hash_pct < weight*100. This is
    the "data mixing" step of corpus assembly (e.g. upweight books,
    downweight common-crawl) as a pure filter — no shuffle at all;
    predicate-pushdown-friendly and trivially parallel."""
    w = F.lit(default_weight)
    for src, wt in weights.items():
        w = F.when(F.col(source_col) == src, F.lit(wt)).otherwise(w)
    return df.filter(_hash_pct(F.col(id_col)) < w * 100)


def pack_token_shards(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    budget: int = 2048,
) -> DataFrame:
    """Assign documents to fixed-token-budget training shards:
    documents are laid out in deterministic id order within each group
    and a shard boundary falls every ``budget`` tokens (a document
    starting before the boundary stays in its shard, so shards can
    overflow by at most one document — offset-based packing, the
    streaming-friendly approximation of bin packing).

    One window per group (single hash partition by group, cumulative
    sum) — the group column (source, language, ...) is what bounds the
    window's partition size at scale; never pack a 100 TB corpus in
    one global ordering.

    Token counts are projected BEFORE the window so the shuffle moves
    only (id, grp, n_tokens) — never the document text itself — and the
    tokenizer regex runs exactly once per document."""
    tokens = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), 0))
    pre = df.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("grp"),
        tokens.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("grp")
        .orderBy(F.col("id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum("n_tokens").over(w)
    return pre.select(
        "id",
        "grp",
        "n_tokens",
        F.floor((cum - F.col("n_tokens")) / F.lit(budget))
        .cast("bigint")
        .alias("shard_id"),
    )


def contamination_check(
    df: DataFrame,
    id_col: str,
    text_col: str,
    eval_pred,
    n: int = 8,
) -> DataFrame:
    """Benchmark-contamination scan: for every eval document (rows
    matching ``eval_pred``), count how many of its word n-grams also
    appear anywhere in the train side, and the contamination ratio.

    The n-gram match is an equi-join on the shingle string — the same
    bucketed shape as LSH dedup, linear in corpus shingles, never a
    doc x doc comparison. Train-side shingles are deduplicated before
    the join so a phrase repeated across the train set counts once.

    r12 plan shape: the train side is DISTINCT on the shingle, so a
    LEFT join from the eval shingles preserves exactly one row per
    eval shingle (matched or not) — n_shingles (count of all rows)
    and n_contaminated (count of matched rows) come out of ONE
    aggregate over that join. The previous hits/totals/outer-join
    triple planned the eval-side shingle subtree twice, costing a
    third full-corpus tokenize+shingle pass plus a join
    (plan-verified: 6 -> 3 corpus scans). ``ev_ids`` is persisted —
    bounded by the eval-set size, by construction a small slice of
    the corpus — so the predicate scan that computes it runs once,
    not once per branch."""
    from pyspark.storagelevel import StorageLevel

    from .dedup import shingle_set

    sh = shingle_set(df, text_col, id_col, n)
    ev_ids = (
        df.filter(eval_pred)
        .select(F.col(id_col).alias("id"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ev = sh.join(ev_ids, "id")
    train_sh = sh.join(ev_ids, "id", "left_anti").select("shingle").distinct()
    joined = ev.join(
        train_sh.withColumn("__hit", F.lit(1)), "shingle", "left"
    )
    per_doc = joined.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.count("__hit").alias("n_contaminated"),
    )
    return per_doc.select(
        "id",
        "n_shingles",
        "n_contaminated",
        (
            F.col("n_contaminated").cast("double") / F.col("n_shingles")
        ).alias("contamination_ratio"),
    )
