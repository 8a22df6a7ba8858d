"""Text analysis operators (BASELINE.json extensions): language ID,
quality scoring, token counting, document fingerprinting.

Generalizes the reference's NLTK tokenize + stopword filter
(sentiment_dashboard.py:138-145) into pure column expressions —
JVM-side, codegen'd, no Python in the hot path. Counting formulas use
only integer arithmetic and single double divisions so results are
bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import tokens_col

# Tiny per-language stopword lists for the n-gram/stopword-hit
# language heuristic. Deliberately overlapping (de/la/die) — the
# classifier resolves via the deterministic priority chain below.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "fr": ("le", "la", "et", "les", "une"),
    "es": ("el", "los", "y", "las", "que"),
    "de": ("der", "die", "und", "das", "ist"),
}

BPE_ISH_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def _hits(toks: Column, words: tuple[str, ...]) -> Column:
    """Distinct stopword hits — order-free, engine-portable."""
    return F.size(
        F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(w) for w in words]))
    )


def language_scores(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-language stopword-hit scores + argmax prediction with a
    fixed priority chain (en > fr > es > de) on ties."""
    toks = tokens_col(text_col)
    scores = {lang: _hits(toks, ws) for lang, ws in LANG_STOPWORDS.items()}
    pred = (
        F.when(
            (scores["en"] >= scores["fr"])
            & (scores["en"] >= scores["es"])
            & (scores["en"] >= scores["de"]),
            "en",
        )
        .when((scores["fr"] >= scores["es"]) & (scores["fr"] >= scores["de"]), "fr")
        .when(scores["es"] >= scores["de"], "es")
        .otherwise("de")
    )
    return df.select(
        F.col(id_col).alias("id"),
        *[c.alias(f"score_{lang}") for lang, c in scores.items()],
        pred.alias("predicted_lang"),
    )


def quality_features(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Length / stopword / diversity features + a composite score.

    score = 0.4*stopword_ratio + 0.3*min(n_tokens/100, 1)
          + 0.3*(n_distinct/n_tokens); int counts, deterministic
    double arithmetic."""
    toks = tokens_col(text_col)
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    stop_hits = _hits(toks, LANG_STOPWORDS["en"])
    n_chars = F.length(F.col(text_col))
    token_chars = F.length(F.concat_ws("", toks))
    nt = n_tokens.cast("double")
    score = (
        0.4 * (stop_hits.cast("double") / F.greatest(nt, F.lit(1.0)))
        + 0.3 * F.least(nt / 100, F.lit(1.0))
        + 0.3 * (n_distinct.cast("double") / F.greatest(nt, F.lit(1.0)))
    )
    return df.select(
        F.col(id_col).alias("id"),
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        n_chars.alias("n_chars"),
        (token_chars.cast("double") / F.greatest(nt, F.lit(1.0))).alias("avg_token_len"),
        score.alias("quality_score"),
    )


def token_counts(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Whitespace token count vs a BPE-ish regex token count."""
    ws = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), 0))
    bpe = F.size(F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(BPE_ISH_RE), 0))
    return df.select(
        F.col(id_col).alias("id"),
        ws.alias("ws_token_count"),
        bpe.alias("bpe_ish_token_count"),
    )


def fingerprint(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Order-insensitive content fingerprint: md5 of the sorted
    distinct token set — near-dup docs with shuffled word order
    collide (the classic 'fingerprint' dedup key)."""
    toks = tokens_col(text_col)
    fp = F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks))))
    return df.select(F.col(id_col).alias("id"), fp.alias("fingerprint"))


def repetition_features(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Gopher-style repetition signals per doc (Rae et al. 2021,
    "Scaling Language Models", §A.1.1 repetition filters):

    - top_token_frac: occurrences of the most frequent token / total
      tokens (catches 'foo foo foo ...' floods),
    - top_2gram_frac: same for word 2-grams (boilerplate catch),
    - dup_3gram_frac: 1 - distinct/total word 3-grams (template catch).

    All three gram widths ride ONE explode, tagged with a '1:'/'2:'/
    '3:' prefix, so the whole operator is a single (id, gram) shuffle
    plus a single per-id shuffle with width-conditional aggregates —
    instead of 3x2 exchanges for three separate gram pipelines. At
    100 TB the gram explode dominates; one pass over the tokens is the
    difference.

    All ratios are exact-int counts with one final double division, so
    they are bit-identical across engines. Docs with fewer tokens than
    the gram width get 0.0 (no grams => nothing repeated)."""
    from .dedup import _shingles_expr, tokens_col

    base = df.select(F.col(id_col).alias("id"), tokens_col(text_col).alias("t"))

    def tagged(n: int) -> Column:
        grams = F.col("t") if n == 1 else _shingles_expr(n)
        arr = F.transform(grams, lambda g: F.concat(F.lit(f"{n}:"), g))
        return F.when(F.size("t") >= n, arr).otherwise(
            F.array().cast("array<string>")
        )

    grams = base.select(
        "id", F.explode(F.concat(tagged(1), tagged(2), tagged(3))).alias("g")
    )
    counts = grams.groupBy("id", "g").agg(F.count(F.lit(1)).alias("cnt"))
    width = F.substring("g", 1, 1)

    def total(n: int) -> Column:
        return F.sum(F.when(width == str(n), F.col("cnt"))).alias(f"t{n}_total")

    def top(n: int) -> Column:
        return F.max(F.when(width == str(n), F.col("cnt"))).alias(f"t{n}_top")

    stats = counts.groupBy("id").agg(
        total(1), top(1), total(2), top(2), total(3), top(3),
        F.count(F.when(width == "3", F.lit(1))).alias("t3_distinct"),
    )
    frac = lambda n, d: F.coalesce(  # noqa: E731
        F.col(n).cast("double") / F.col(d).cast("double"), F.lit(0.0)
    )
    return (
        base.select("id")
        .join(stats, "id", "left")
        .select(
            "id",
            F.coalesce("t1_total", F.lit(0)).alias("n_tokens"),
            frac("t1_top", "t1_total").alias("top_token_frac"),
            frac("t2_top", "t2_total").alias("top_2gram_frac"),
            F.coalesce(
                (F.col("t3_total") - F.col("t3_distinct")).cast("double")
                / F.col("t3_total").cast("double"),
                F.lit(0.0),
            ).alias("dup_3gram_frac"),
        )
    )
