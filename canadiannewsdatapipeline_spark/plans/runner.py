"""Dependency-ordered model runner — the engine's equivalent of the
reference's Airflow DbtTaskGroup (ingest_news.py:181-186), which
Jinja-compiles one task per dbt model and runs them in ref() order.

Here a model is a plain function DataFrame(s) -> DataFrame; the runner
topologically sorts, executes each once, and materializes according to
the model's config: ``view`` models stay lazy DataFrames (dbt
staging/ref views, dbt_project.yml:34-41), ``table`` models are written
to parquet and re-read (dbt marts, dbt_project.yml:43-45) — reading
back the parquet both truncates the lineage for downstream plans and is
the write-audit-publish point (S12 idempotency: a model whose output
dir already exists can be skipped with skip_existing=True).
"""

from __future__ import annotations

import os
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field
from graphlib import TopologicalSorter

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Model:
    name: str
    fn: Callable[..., DataFrame]  # receives resolved dep DataFrames in order
    deps: Sequence[str] = field(default_factory=tuple)
    materialized: str = "view"  # "view" | "table"
    partition_by: Sequence[str] = field(default_factory=tuple)


class ModelRunner:
    def __init__(
        self,
        spark: SparkSession,
        models: Sequence[Model],
        warehouse_dir: str | None = None,
    ):
        self.spark = spark
        self.models = {m.name: m for m in models}
        self.warehouse_dir = warehouse_dir

    def order(self) -> list[str]:
        ts = TopologicalSorter({m.name: set(m.deps) for m in self.models.values()})
        known = set(self.models)
        order = []
        for name in ts.static_order():
            if name in known:
                order.append(name)
        return order

    def run(
        self, inputs: dict[str, DataFrame], skip_existing: bool = False
    ) -> dict[str, DataFrame]:
        """Execute all models; ``inputs`` seeds external sources by name."""
        resolved: dict[str, DataFrame] = dict(inputs)
        for name in self.order():
            model = self.models[name]
            missing = [d for d in model.deps if d not in resolved]
            if missing:
                raise ValueError(f"model {name}: unresolved deps {missing}")
            out_path = (
                os.path.join(self.warehouse_dir, name) if self.warehouse_dir else None
            )
            if (
                skip_existing
                and model.materialized == "table"
                and out_path
                and os.path.isdir(out_path)
            ):
                resolved[name] = self.spark.read.parquet(out_path)
                continue
            df = model.fn(*[resolved[d] for d in model.deps])
            if model.materialized == "table" and out_path:
                writer = df.write.mode("overwrite")
                if model.partition_by:
                    writer = writer.partitionBy(*model.partition_by)
                writer.parquet(out_path)
                df = self.spark.read.parquet(out_path)
            resolved[name] = df
        return resolved
