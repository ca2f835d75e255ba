"""Strict mirror of the driver's pandas canonicalization (round-6 verdict).

The round driver compares Spark vs DuckDB by materializing BOTH results
as pandas frames and hashing the values — so a column that is
bit-identical in value but lands in a different pandas dtype *class*
(Spark DecimalType -> `object` holding `Decimal('123.4500')` vs DuckDB
DECIMAL -> `float64` `123.45`; DuckDB integer `sum()` -> HUGEINT ->
`float64` vs Spark int64) grades `hash_match: false`.  Round 6 shipped
five such rows because tests/test_queries_vs_duckdb.py's `_norm`
converts Decimal->float and rounds BEFORE comparing.

This suite closes that hole: for every oracle-backed registry row it
fetches the Spark result via `toPandas()` and the oracle via duckdb
`.df()` (exactly the two canonicalization paths the driver uses) and
asserts that each output column lands in the SAME dtype class on both
sides.  Classes known to be non-fatal in driver history are merged:
int32 vs int64 -> "int"; date vs datetime -> "time".  Everything else
(float vs int, float vs Decimal-object, int vs Decimal-object, ...) is
a shipping bug even when the values are equal.

It also replays the driver's exact-value compare (no rounding, no
Decimal normalization beyond float()) so representation drift inside a
class is caught too.
"""

from __future__ import annotations

import datetime
import decimal
import math
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from nomba_data_pipeline_spark.catalog import TABLES
from nomba_data_pipeline_spark.plans.queries import REGISTRY
from tests.conftest import SF_SMALL

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", SF_SMALL)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    yield con
    con.close()


def _dtype_class(s: pd.Series) -> str:
    """Collapse a post-pandas column into the driver-fatal dtype class."""
    dt = s.dtype
    if pd.api.types.is_bool_dtype(dt):
        return "bool"
    if pd.api.types.is_float_dtype(dt):
        return "float"
    if pd.api.types.is_integer_dtype(dt):
        return "int"
    if pd.api.types.is_datetime64_any_dtype(dt):
        return "time"
    # object column: classify by the first non-null value
    nn = s.dropna()
    if nn.empty:
        return "empty"
    v = nn.iloc[0]
    if isinstance(v, decimal.Decimal):
        return "decimal"
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, (datetime.date, datetime.datetime, pd.Timestamp)):
        return "time"
    if isinstance(v, (int, np.integer)):
        return "int"
    if isinstance(v, (float, np.floating)):
        return "float"
    if isinstance(v, str):
        return "str"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "list"
    return type(v).__name__


def _exact(v):
    """Driver-faithful cell canonicalization: NO rounding."""
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, pd.Timestamp) or (
        isinstance(v, (datetime.date, datetime.datetime))
    ):
        # driver history: date-vs-datetime is NOT fatal — normalize both
        # to a midnight timestamp before comparing
        return pd.Timestamp(v).isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, np.ndarray):
        return tuple(_exact(x) for x in v)
    if isinstance(v, (list, tuple)):
        return tuple(_exact(x) for x in v)
    return v


def _multiset(df: pd.DataFrame):
    cols = sorted(df.columns)
    rows = [
        tuple(_exact(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows, key=lambda t: tuple(str(x) for x in t))


ORACLE_ROWS = [n for n, s in REGISTRY.items() if s.oracle]


@pytest.mark.parametrize("name", ORACLE_ROWS)
def test_pandas_dtype_and_exact_value_parity(spark, ddb, name):
    spec = REGISTRY[name]
    spd = spec.fn(spark, SF).toPandas()
    dpd = ddb.execute(spec.oracle).df()

    assert sorted(spd.columns) == sorted(dpd.columns), (
        f"{name}: column mismatch {list(spd.columns)} vs {list(dpd.columns)}"
    )

    bad = {}
    for c in spd.columns:
        sc, dc = _dtype_class(spd[c]), _dtype_class(dpd[c])
        if sc != dc and "empty" not in (sc, dc):
            bad[c] = (f"spark={sc}({spd[c].dtype})", f"oracle={dc}({dpd[c].dtype})")
    assert not bad, f"{name}: driver-fatal dtype divergence: {bad}"

    assert len(spd) == len(dpd), f"{name}: row count {len(spd)} vs {len(dpd)}"
    sm, dm = _multiset(spd), _multiset(dpd)
    mismatches = [(a, b) for a, b in zip(sm, dm) if a != b]
    assert not mismatches, f"{name}: exact-value mismatches: {mismatches[:3]}"
