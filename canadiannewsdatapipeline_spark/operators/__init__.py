from .backfill import backfill_within_group, disjunctive_group_min
from .dedup_window import (
    distinct_on,
    keep_first_by_order,
    latest_row_per_key,
    top_n_per_group,
)
from .timeseries import daily_resample
from .topk import top_k_words

__all__ = [
    "backfill_within_group",
    "disjunctive_group_min",
    "distinct_on",
    "keep_first_by_order",
    "latest_row_per_key",
    "top_n_per_group",
    "daily_resample",
    "top_k_words",
]
