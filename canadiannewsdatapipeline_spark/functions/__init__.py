from .cleaning import (
    EMAIL_PATTERN,
    PUNCT_CLASS,
    WWW_URL_PATTERN,
    clean_article_content,
    normalize_whitespace,
    scrub_emails_and_urls,
    strip_punct,
    truncate_at_marker,
)
from .keys import surrogate_key

__all__ = [
    "EMAIL_PATTERN",
    "PUNCT_CLASS",
    "WWW_URL_PATTERN",
    "clean_article_content",
    "normalize_whitespace",
    "scrub_emails_and_urls",
    "strip_punct",
    "truncate_at_marker",
    "surrogate_key",
]
