"""Data-quality checks — the engine's equivalent of the reference's
dbt schema tests (SURVEY.md §5.1 item 2): ``unique`` / ``not_null`` on
every key (stage.yaml:3-14, ref.yaml:3-8, datamarts.yaml:3-70),
``relationships`` referential integrity (datamarts.yaml:9-70), and
``dbt_utils.unique_combination_of_columns`` (datamarts.yaml:27-33).

Each check compiles to a violation DataFrame (dbt's "test = query that
must return zero rows"); ``checks_summary`` unions the counts into one
small report frame. All shapes are shuffle-light: aggregates with
map-side partials and broadcast-able anti-joins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unique_violations(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Key tuples appearing more than once (dbt ``unique`` /
    ``unique_combination_of_columns``)."""
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


def not_null_violations(df: DataFrame, col: str) -> DataFrame:
    """Rows with a NULL key (dbt ``not_null``)."""
    return df.filter(F.col(col).isNull())


def relationship_violations(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """Child keys with no matching parent (dbt ``relationships``) —
    a left-anti join, broadcast when the parent is dimension-sized."""
    parent_keys = parent.select(F.col(parent_key).alias(child_key)).distinct()
    return child.select(child_key).filter(F.col(child_key).isNotNull()).join(
        F.broadcast(parent_keys), child_key, "left_anti"
    )


def checks_summary(checks: Sequence[tuple[str, DataFrame]]) -> DataFrame:
    """One row per check: (check_name, n_violations)."""
    outs = [
        df.agg(F.count(F.lit(1)).cast("long").alias("n_violations")).select(
            F.lit(name).alias("check_name"), "n_violations"
        )
        for name, df in checks
    ]
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result
