"""Surrogate-key hashing, bit-compatible with dbt_utils 1.3.0.

The reference derives every star-schema key with
``dbt_utils.generate_surrogate_key`` (transformed.sql:236-244), which
compiles to ``md5(concat_ws('-', coalesce(cast(col as varchar),
'_dbt_utils_surrogate_key_null_'), ...))``. We reproduce that recipe
exactly so IDs round-trip against any dbt-produced oracle
(SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NULL_PLACEHOLDER = "_dbt_utils_surrogate_key_null_"


def surrogate_key(*cols: Column | str) -> Column:
    """md5 surrogate key over the given columns (dbt_utils recipe).

    Only pass columns whose string rendering is engine-portable
    (strings, integers, dates); float renderings differ across engines.
    """
    parts = [
        F.coalesce(F.col(c).cast("string") if isinstance(c, str) else c.cast("string"),
                   F.lit(NULL_PLACEHOLDER))
        for c in cols
    ]
    return F.md5(F.concat_ws("-", *parts))
