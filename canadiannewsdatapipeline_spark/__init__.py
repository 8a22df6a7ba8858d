"""newsflow — a PySpark-native analytics engine with the query and
data-processing capabilities of GarettKaube/CanadianNewsDataPipeline.

The reference (see /root/reference, SURVEY.md) is a news ETL pipeline:
scrapers -> Postgres raw tables -> dbt star-schema models -> LLM
sentiment enrichment -> pandas dashboard queries. This package
re-expresses that entire surface as idiomatic PySpark DataFrame
pipelines, designed for 100 TB scale:

- ``sources``   — parquet/CSV/JSONL readers & writers, table registry
- ``functions`` — scalar column functions (cleaning, keys, regex)
- ``operators`` — relational operators (dedup, backfill, top-k,
                  time-series resample, quality checks) plus the
                  large-scale training-data extensions (MinHash/SimHash
                  dedup, similarity search, text stats, multimodal)
- ``plans``     — the dbt-equivalent declarative model DAG + runner
- ``streaming`` — Structured Streaming ingest leg
- ``enrich``    — pluggable batch-inference (sentiment, translation)
"""

__version__ = "0.1.0"
