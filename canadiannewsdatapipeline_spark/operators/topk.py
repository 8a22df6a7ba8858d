"""Word-frequency top-K (SURVEY.md §2.4 A8, §2.10 UD3).

The reference tokenizes with NLTK, drops stopwords/non-alpha words in a
Python loop, and lets WordCloud count terms (sentiment_dashboard.py:
138-166, 364). Here the whole thing is JVM-side: regex token extract ->
explode -> filter -> groupBy count -> ordered limit. The stopword set
ships as a literal array (broadcast with the plan); counting gets
map-side partial aggregation; the final top-K is a TakeOrdered, not a
full sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_PATTERN = r"[a-z]+"


def tokenize(df: DataFrame, text_col: str, out_col: str = "word") -> DataFrame:
    """Lowercase alpha tokens, one row per token occurrence."""
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), 0)
    return df.select(F.explode(toks).alias(out_col))


def top_k_words(
    df: DataFrame,
    text_col: str,
    k: int = 50,
    stopwords: Sequence[str] = (),
) -> DataFrame:
    """Top-K most frequent non-stopword tokens; ties broken by word
    ascending so the result is deterministic (the reference's WordCloud
    ordering is an implementation detail)."""
    words = tokenize(df, text_col)
    if stopwords:
        words = words.filter(~F.col("word").isin(*stopwords))
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(k)
    )
