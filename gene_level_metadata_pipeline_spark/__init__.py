"""gene_level_metadata_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first implementation of the query and data-processing
capabilities of the reference R/tidyverse ETL pipeline
(GabrielMarengoQM/gene-level-metadata-pipeline, surveyed in SURVEY.md), plus
the scale-out operators a 100 TB training-data pipeline needs
(deduplication, similarity search, text analysis, multimodal plumbing).

Layout:
  session     — SparkSession bootstrap (AQE, Arrow, broadcast defaults)
  operators/  — harmonize, conflicts, joins, reshape, headers, dedup,
                similarity, textanalysis, multimodal
  functions/  — scalar column helpers (regex, recode, sentinels, rounding)
  sources/    — messy-ingestion readers (skip-N, zip/gz, Excel, JSONL)
  plans/      — catalog (named-table registry)
  streaming/  — Structured Streaming slices over the events table
"""

from gene_level_metadata_pipeline_spark.session import get_spark  # noqa: F401
