"""Pluggable batch-inference enrichment (SURVEY.md §2.10 UD1/UD2).

The reference's enrichment loop is an external OpenAI Batch job
(sentiment_batch_job_tasks.py:165-254: build JSONL -> upload -> poll
-> parse) and a per-row googletrans UPDATE loop
(translate_french_news.py:17-63). Engine-side that becomes a
``mapInPandas`` operator with a pluggable scorer/translator: Arrow
batches in, appended struct columns out — partition-parallel, no
driver round-trip, and the external-API connector is just one Scorer
implementation. Deterministic mocks stand in here (no network in this
environment) and give tests stable goldens.

The row-UPDATE write-back (S18) is rewritten as a conditional
column overwrite (SURVEY.md §4.2 item 4): no row-level UPDATE exists
in Spark, and the full-column form is a single scan at any scale.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

Scorer = Callable[[pd.Series], pd.DataFrame]


class MockSentimentScorer:
    """Deterministic stand-in for the LLM scorer: scores derive from a
    sha256 of the content, in [0, 1] with 2 decimals (the reference's
    SentimentDC schema, PydanticModels.py:53-55); every 17th hash
    returns 'N/A'-equivalent nulls like the real batch output."""

    def __call__(self, content: pd.Series) -> pd.DataFrame:
        def one(text: str | None) -> tuple[float | None, float | None]:
            if text is None:
                return None, None
            h = hashlib.sha256(text.encode("utf-8")).digest()
            if h[0] % 17 == 0:
                return None, None
            return (h[1] % 101) / 100.0, (h[2] % 101) / 100.0

        pairs = [one(t) for t in content]
        return pd.DataFrame(
            {
                "sentiment_mark": [p[0] for p in pairs],
                "sentiment_poilievre": [p[1] for p in pairs],
            }
        )


class MockTranslator:
    """Deterministic stand-in for googletrans: tags the text."""

    def __call__(self, texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: None if t is None else f"[en] {t}")


def score_sentiment(
    df: DataFrame,
    content_col: str,
    scorer: Scorer | None = None,
) -> DataFrame:
    """Append sentiment_mark / sentiment_poilievre via Arrow-batched
    mapInPandas (UD2). Output schema = input + two doubles."""
    scorer = scorer or MockSentimentScorer()
    # copy the fields: StructType.add mutates in place and df.schema is cached
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("sentiment_mark", T.DoubleType()),
            T.StructField("sentiment_poilievre", T.DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            scores = scorer(pdf[content_col])
            yield pd.concat(
                [pdf.reset_index(drop=True), scores.reset_index(drop=True)], axis=1
            )

    return df.mapInPandas(run, out_schema)


def translate_language(
    df: DataFrame,
    content_cols: list[str],
    language_col: str = "language",
    source_language: str = "french",
    target_language: str = "english",
    translator: Callable[[pd.Series], pd.Series] | None = None,
) -> DataFrame:
    """UD1 + S18 rewrite: translate rows in ``source_language`` and
    set their language to ``target_language`` — a conditional overwrite
    of the whole frame, not per-row UPDATEs (translate_french_news.py:
    46-62)."""
    translator = translator or MockTranslator()
    out_schema = df.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mask = pdf[language_col] == source_language
            if mask.any():
                for c in content_cols:
                    pdf.loc[mask, c] = translator(pdf.loc[mask, c])
                pdf.loc[mask, language_col] = target_language
            yield pdf

    return df.mapInPandas(run, out_schema)


def two_phase_enrich(
    df: DataFrame,
    id_col: str,
    content_col: str,
    requests_path: str,
    responses_path: str,
    spark=None,
) -> DataFrame:
    """The reference's asynchronous submit/poll/load-later shape
    (§3.2): phase 1 writes a requests table (JSONL), phase 2 joins the
    responses back on id. Checkpointed at the storage layer, so a
    restart resumes from whichever phase completed (S12 semantics)."""
    from ..sources.jsonl import read_responses_jsonl, write_requests_jsonl

    spark = spark or df.sparkSession
    write_requests_jsonl(df.select(id_col, content_col), requests_path, id_col, content_col)
    responses = read_responses_jsonl(spark, responses_path).withColumn(
        id_col, F.col("custom_id").cast(dict(df.dtypes)[id_col])
    )
    return df.join(responses.drop("custom_id"), id_col, "left")
