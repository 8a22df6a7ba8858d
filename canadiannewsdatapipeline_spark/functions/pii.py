"""PII redaction for training corpora: email / phone / IPv4 scrub with
per-doc match counts.

Pure `regexp_replace` / `regexp_count` column expressions — JVM-side,
codegen'd, zero Python in the hot path. The patterns are restricted to
syntax with identical semantics in Java regex (Spark) and RE2 (DuckDB
oracle): character classes, bounded repetition, `\\b` word boundaries —
no backrefs, no lookaround.

Generalizes the reference's email scrub (its content cleaner strips
`\\S*@\\S*\\s?` and mailto links, see reference dbt
transformed.sql:117-123) to the standard corpus-sanitization trio.
Scrub order matters: emails first (an IP-like dotted quad inside a
hostname must not survive as bait for the IP pass), then phones, then
IPs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\(\d{3}\) \d{3}-\d{4}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def count_pii(c: Column) -> tuple[Column, Column, Column]:
    """(n_emails, n_phones, n_ips) match counts, evaluated on the
    UN-scrubbed text (counts first, then redact)."""
    return (
        F.regexp_count(c, F.lit(EMAIL_RE)),
        F.regexp_count(c, F.lit(PHONE_RE)),
        F.regexp_count(c, F.lit(IPV4_RE)),
    )


def scrub_pii(c: Column) -> Column:
    """Redact emails -> <EMAIL>, phones -> <PHONE>, IPv4 -> <IP>."""
    c = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    c = F.regexp_replace(c, PHONE_RE, "<PHONE>")
    return F.regexp_replace(c, IPV4_RE, "<IP>")
