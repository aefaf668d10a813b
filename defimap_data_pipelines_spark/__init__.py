"""defimap_data_pipelines_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the
Defimap/defimap-data-pipelines reference (a BigQuery/Airflow/pandas DeFi
analytics pipeline) as an idiomatic PySpark library, extended with the
operators a large-scale (100 TB) training-data pipeline needs:
deduplication, similarity search, multimodal column plumbing, and text
analysis.

Layout:
  session      — tuned SparkSession factory (AQE, Arrow, UTC)
  config       — reference constants (INITIAL_PRINCIPAL, STABLECOINS, ...)
  schemas      — declared StructTypes (RAW_SCHEMA and derived tables)
  functions/   — column-level expression helpers (scalar, vector, text)
  sources/     — readers/writers/ingestion adapters
  operators/   — DataFrame -> DataFrame operators (the engine surface)
  plans/       — composed analytic queries (domain series, TPC-H-style)
  pipelines/   — end-to-end compositions (transform, load)
  streaming/   — Structured Streaming variants of the batch transforms
"""

__version__ = "0.1.0"

from defimap_data_pipelines_spark.session import get_spark  # noqa: F401
