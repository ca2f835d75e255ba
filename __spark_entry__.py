"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship medallion query on sf0.001 (smoke).
queries()    — every implemented operator from SURVEY §2 + extensions.
oracle_sql() — DuckDB-equivalent SQL per query (correctness gate).

Implementation lives in nomba_data_pipeline_spark/; this module is a
thin adapter over plans/queries.py's REGISTRY.
"""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nomba_data_pipeline_spark.plans.queries import REGISTRY

def _ship_package(spark: SparkSession) -> None:
    """Make `nomba_data_pipeline_spark` importable on EXECUTOR Python
    workers regardless of the harness's cwd/PYTHONPATH. The Arrow-UDF
    rows (multimodal, ANN BLAS, z-scores) cloudpickle references to
    module-level functions, so workers must import the package; a
    driver whose cwd is elsewhere would otherwise fail only those rows.
    One shared implementation (nomba_data_pipeline_spark.shipping) —
    the Python DataSource connector ships through the same path."""
    from nomba_data_pipeline_spark.shipping import ship_package

    ship_package(spark)


def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
    @functools.wraps(fn)
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ship_package(spark)
        return fn(spark, sf_dir)

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ship_package(spark)
    return REGISTRY["flagship_revenue_by_region"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(spec.fn) for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
