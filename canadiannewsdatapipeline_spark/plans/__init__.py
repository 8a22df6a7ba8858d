from .models import (
    articles_mart,
    authors_mart,
    bridge_mart,
    sentiment_mart,
    sources_mart,
    stg_articles,
    stg_sentiment,
    transformed,
)
from .runner import Model, ModelRunner

__all__ = [
    "stg_articles",
    "stg_sentiment",
    "transformed",
    "articles_mart",
    "authors_mart",
    "sources_mart",
    "bridge_mart",
    "sentiment_mart",
    "Model",
    "ModelRunner",
]
