"""JSONL batch-inference sink/source (SURVEY.md §2.1 S14/S16).

The reference writes one OpenAI chat request object per row to a JSONL
file (sentiment_batch_job_tasks.py:195-223) and later parses response
lines whose payload is doubly JSON-encoded — the assistant message
content is itself a JSON document (:258-292). Spark-native:
``to_json(struct(...))`` -> text sink; ``spark.read.json`` +
``get_json_object`` twice for the nested payload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_requests_jsonl(
    df: DataFrame,
    path: str,
    id_col: str,
    content_col: str,
    model: str = "gpt-4o-mini",
    system_prompt: str = "Score the sentiment.",
) -> None:
    """One chat-completion request object per row, JSONL — mirrors the
    request template at sentiment_batch_job_tasks.py:195-218."""
    body = F.struct(
        F.lit(model).alias("model"),
        F.array(
            F.struct(F.lit("system").alias("role"), F.lit(system_prompt).alias("content")),
            F.struct(F.lit("user").alias("role"), F.col(content_col).alias("content")),
        ).alias("messages"),
    )
    req = F.struct(
        F.col(id_col).cast("string").alias("custom_id"),
        F.lit("POST").alias("method"),
        F.lit("/v1/chat/completions").alias("url"),
        body.alias("body"),
    )
    df.select(F.to_json(req).alias("value")).write.mode("overwrite").text(path)


def read_responses_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Parse batch responses: custom_id + the doubly-encoded assistant
    payload (JSON inside choices[0].message.content) — the S16 shape.

    Returns (custom_id, sentiment_mark, sentiment_poilievre) with the
    reference's 'N/A' -> NULL scrub (S17) applied."""
    raw = spark.read.text(path)
    inner = F.get_json_object(
        F.col("value"), "$.response.body.choices[0].message.content"
    )
    na = lambda p: F.when(  # noqa: E731
        F.get_json_object(inner, p) == "N/A", None
    ).otherwise(F.get_json_object(inner, p).cast("double"))
    return raw.select(
        F.get_json_object("value", "$.custom_id").alias("custom_id"),
        na("$.sentiment_mark").alias("sentiment_mark"),
        na("$.sentiment_poilievre").alias("sentiment_poilievre"),
    )
