"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship medallion query on sf0.001 (smoke).
queries()    — every implemented operator from SURVEY §2 + extensions.
oracle_sql() — DuckDB-equivalent SQL per query (correctness gate).

Implementation lives in nomba_data_pipeline_spark/; this module is a
thin adapter over plans/queries.py's REGISTRY.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nomba_data_pipeline_spark.plans.queries import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["flagship_revenue_by_region"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
