"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship medallion query on sf0.001 (smoke).
queries()    — every implemented operator from SURVEY §2 + extensions.
oracle_sql() — DuckDB-equivalent SQL per query (correctness gate).

Implementation lives in nomba_data_pipeline_spark/; this module is a
thin adapter over plans/queries.py's REGISTRY.
"""

from __future__ import annotations

import functools
import os
import zipfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nomba_data_pipeline_spark.plans.queries import REGISTRY

_REPO = os.path.dirname(os.path.abspath(__file__))
_PKG_ZIP: str | None = None
_SHIP_WARNED: bool = False


def _ship_package(spark: SparkSession) -> None:
    """Make `nomba_data_pipeline_spark` importable on EXECUTOR Python
    workers regardless of the harness's cwd/PYTHONPATH. The Arrow-UDF
    rows (multimodal, ANN BLAS, z-scores) cloudpickle references to
    module-level functions, so workers must import the package; a
    driver whose cwd is elsewhere would otherwise fail only those rows.
    addPyFile distributes a zip once per SparkContext and prepends it
    to the workers' sys.path; repeat calls with the same path no-op."""
    global _PKG_ZIP
    if _PKG_ZIP is None:
        import tempfile

        pkg_dir = os.path.join(_REPO, "nomba_data_pipeline_spark")
        # per-process name: two concurrent harness processes sharing a
        # fixed path could read each other's half-written zip
        zpath = os.path.join(
            tempfile.gettempdir(),
            f"nomba_data_pipeline_spark_pkg_{os.getpid()}.zip",
        )
        with zipfile.ZipFile(zpath, "w", zipfile.ZIP_STORED) as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        zf.write(full, os.path.relpath(full, _REPO))
        _PKG_ZIP = zpath
    try:
        spark.sparkContext.addPyFile(_PKG_ZIP)
    except Exception as e:  # e.g. Connect-only session, stopped context
        # Worker imports then rely on the environment; log the cause once
        # so a real failure (zip unreadable, dead context) doesn't surface
        # later as an opaque worker ImportError on the Arrow-UDF rows.
        global _SHIP_WARNED
        if not _SHIP_WARNED:
            _SHIP_WARNED = True
            import sys

            print(
                f"__spark_entry__: addPyFile({_PKG_ZIP}) failed "
                f"({type(e).__name__}: {e}); workers fall back to the "
                "environment's PYTHONPATH",
                file=sys.stderr,
            )


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
