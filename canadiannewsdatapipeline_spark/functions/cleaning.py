"""Text-cleaning column functions (SURVEY.md §2.8).

The reference duplicates its content-cleaning logic in two places
(sentiment_batch_job_tasks.py:82-106 and sentiment_dashboard.py:110-130);
here it is one set of pure column functions, all JVM-side built-ins
(no Python UDFs), so they stay inside whole-stage codegen at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Email regex used at four places in the reference
# (get_news.py:27, utils.py:123, get_news_manual.py:42,
# sentiment_batch_job_tasks.py:86). Java and RE2 agree on this pattern.
EMAIL_PATTERN = r"[\w\.-]+@[\w\-]+\.[a-zA-Z]{2,6}"

# www.<domain> scrub (sentiment_batch_job_tasks.py:99-105)
WWW_URL_PATTERN = r"www\.[a-zA-Z0-9\-]+\.[\w]{2,6}"

# Postgres POSIX [[:punct:]] (transformed.sql:75) expanded to an explicit
# ASCII class valid in Java regex (SURVEY.md §7.4 item 4).
PUNCT_CLASS = r"[!-/:-@\[-`{-~]"


def strip_punct(c: Column) -> Column:
    """REGEXP_REPLACE(c, '[[:punct:]]', '', 'g') — transformed.sql:75."""
    return F.regexp_replace(c, PUNCT_CLASS, "")


def normalize_whitespace(c: Column) -> Column:
    """Collapse runs of whitespace to single spaces and trim."""
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def scrub_emails_and_urls(c: Column) -> Column:
    """Remove emails then bare www URLs — sentiment_batch_job_tasks.py:96-105."""
    return F.regexp_replace(F.regexp_replace(c, EMAIL_PATTERN, ""), WWW_URL_PATTERN, "")


def truncate_at_marker(c: Column, marker: str) -> Column:
    """Keep text before the first occurrence of ``marker`` —
    the reference's ``split("trending now")[0]`` truncation
    (sentiment_batch_job_tasks.py:89-93)."""
    return F.split_part(c, F.lit(marker), F.lit(1))


def clean_article_content(c: Column) -> Column:
    """The unified content-cleaning operator (SURVEY.md §4.2 item 5):
    newline removal (F5) + "trending now" truncation (F12) +
    email/URL scrub (F11), in reference order."""
    c = F.regexp_replace(c, r"\n", "")
    c = truncate_at_marker(truncate_at_marker(c, "trending now"), "Trending Now")
    return scrub_emails_and_urls(c)
