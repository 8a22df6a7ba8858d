"""Record validation (SURVEY.md §2.2 P10, §2.10 UD4).

The reference validates each scraped dict with a Pydantic model —
required fields, EmailStr, a bias Literal, and an author-name regex
that nulls bad authors (PydanticModels.py:9-29, utils.py:150-158).
Row-at-a-time Python validation can't scale; here the same rules
compile to column predicates evaluated in one codegen'd pass, emitting
a ``valid`` flag plus the first ``reject_reason`` (so rejects are
observable, like the reference's logged ValidationErrors).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.cleaning import EMAIL_PATTERN

# PydanticModels.py:27 — accepts accented latin names, apostrophes,
# dots, plus signs, spaces, dashes.
AUTHOR_NAME_RE = r"^[A-Za-zÀ-ÖØ-öø-ÿ'\.+ -]+$"
BIAS_DOMAIN = ("left", "right", "centre")


@dataclass(frozen=True)
class Rule:
    name: str
    predicate: Column  # True = valid


def not_null(col: str) -> Rule:
    return Rule(f"{col}_null", F.col(col).isNotNull())


def matches(col: str, pattern: str) -> Rule:
    """NULL passes (optional field) — only non-null violations reject."""
    return Rule(f"{col}_format", F.col(col).isNull() | F.col(col).rlike(pattern))


def in_domain(col: str, domain: tuple[str, ...]) -> Rule:
    return Rule(f"{col}_domain", F.col(col).isNull() | F.col(col).isin(*domain))


def news_record_rules() -> list[Rule]:
    """The NewsInfo model's constraints as column rules."""
    return [
        not_null("title"),
        not_null("publishedat"),
        not_null("source_name"),
        matches("author_email", f"^{EMAIL_PATTERN}$"),
        in_domain("bias", BIAS_DOMAIN),
    ]


def validate(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Add ``valid`` + ``reject_reason`` columns (first failing rule)."""
    valid = F.lit(True)
    reason = F.lit(None).cast("string")
    for r in reversed(rules):
        reason = F.when(~r.predicate, F.lit(r.name)).otherwise(reason)
    for r in rules:
        valid = valid & r.predicate
    return df.withColumn("valid", valid).withColumn("reject_reason", reason)


def scrub_invalid_authors(df: DataFrame, col: str = "author") -> DataFrame:
    """The reference nulls (not drops) authors failing the name regex
    or containing non-alphanumerics beyond the allowed set
    (PydanticModels.py:22-29, utils.py:77-95 — implementing the
    *intended* semantics; the reference's remove-while-iterating loop
    skips elements, SURVEY.md §2.8 F14)."""
    return df.withColumn(
        col, F.when(F.col(col).rlike(AUTHOR_NAME_RE), F.col(col))
    )
