from .batch import (
    MockSentimentScorer,
    MockTranslator,
    score_sentiment,
    translate_language,
)

__all__ = [
    "MockSentimentScorer",
    "MockTranslator",
    "score_sentiment",
    "translate_language",
]
