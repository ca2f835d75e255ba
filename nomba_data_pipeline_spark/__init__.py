"""nomba_data_pipeline_spark — PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference CDC/ELT
pipeline (Ccinaza/nomba-data-pipeline: MongoDB/Postgres -> S3 stage ->
ClickHouse -> dbt medallion models, Dagster-scheduled), re-expressed
idiomatically on Spark DataFrame/SQL/Catalyst, plus the large-scale
training-data operators (dedup, similarity search, text analysis,
multimodal plumbing) a 100 TB pipeline needs.

Layout:
  session     SparkSession factory (AQE, UTC, arrow, tuned shuffle)
  catalog     testdata table loaders / temp-view registration
  sources     readers + schema-inference parity (reference base_loader.py:867-993)
  operators   load-mode writers (merge/upsert/snapshot), SCD2, dedup, similarity
  functions   scalar/text/time helpers shared by queries and models
  plans       medallion model registry + runner + data-quality checks
  streaming   incremental micro-batch runner (Structured Streaming)
"""

__version__ = "0.1.0"

from nomba_data_pipeline_spark.session import get_spark  # noqa: F401
