"""Local mirror of the driver's correctness gate: run every REGISTRY
query on Spark and its oracle on DuckDB over the same parquet, compare
row count + order-insensitive values (sorted columns, normalized)."""

from __future__ import annotations

import math

import duckdb
import pytest

import os

from nomba_data_pipeline_spark.catalog import TABLES
from nomba_data_pipeline_spark.plans.queries import REGISTRY
from tests.conftest import SF_SMALL

# default sf0.001 for speed; SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01
# reruns the whole parity suite at the driver's grading scale
SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", SF_SMALL)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    yield con
    con.close()


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    try:  # Decimal -> float for cross-engine compare
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 6)
    except Exception:
        pass
    return v


def _rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        [tuple(_norm(r[i]) for i in order) for r in rows],
        key=lambda t: tuple(str(x) for x in t),
    )


@pytest.mark.parametrize("name", [n for n, s in REGISTRY.items() if s.oracle])
def test_query_matches_oracle(spark, ddb, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF)
    srows = sdf.collect()
    scols = sdf.columns

    ddf = ddb.execute(spec.oracle).fetchall()
    dcols = [d[0] for d in ddb.description]

    assert sorted(scols) == sorted(dcols), f"{name}: column mismatch {scols} vs {dcols}"
    assert len(srows) == len(ddf), f"{name}: row count {len(srows)} vs {len(ddf)}"
    sm = _rows_to_multiset(scols, [tuple(r) for r in srows])
    dm = _rows_to_multiset(dcols, ddf)
    mismatches = [(a, b) for a, b in zip(sm, dm) if a != b]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:3]}"


@pytest.mark.parametrize("name", [n for n, s in REGISTRY.items() if s.oracle is None])
def test_oracle_free_query_runs(spark, name):
    df = REGISTRY[name].fn(spark, SF)
    assert df.count() >= 0
