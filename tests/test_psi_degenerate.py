"""Regression for the snapshot_drift_psi degenerate-slice divergence
(round-6 ADVICE): when every event of a type falls at or before the
window midpoint, the 'new' side of that type has zero observed rows.
The smoothed PSI must still be finite and equal to the DuckDB oracle —
the old implementation derived per-side totals from the sparse observed
counts (inner join), dropping the empty slice's grid rows and yielding
null psi while the oracle returned a finite smoothed value."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from nomba_data_pipeline_spark.plans.queries import (
    SQL_SNAPSHOT_DRIFT_PSI,
    q_snapshot_drift_psi,
)


def test_psi_finite_and_oracle_equal_when_one_side_is_empty(spark, tmp_path):
    mixed_ts = ["2024-01-01", "2024-01-02", "2024-01-09", "2024-01-10"]
    df = pd.DataFrame(
        {
            "event_type": ["allold"] * 4 + ["mixed"] * 8,
            "ts": pd.to_datetime(
                ["2024-01-01", "2024-01-01", "2024-01-02", "2024-01-02"]
                + mixed_ts * 2
            ),
            "value": [10.0, 60.0, 120.0, 400.0] * 3,
        }
    )
    df.to_parquet(tmp_path / "events.parquet")

    out = {
        r["event_type"]: r["psi"]
        for r in q_snapshot_drift_psi(spark, str(tmp_path)).collect()
    }
    assert set(out) == {"allold", "mixed"}
    assert out["allold"] is not None and math.isfinite(out["allold"])

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'"
    )
    oracle = dict(con.execute(SQL_SNAPSHOT_DRIFT_PSI).fetchall())
    con.close()
    assert out == pytest.approx(oracle, abs=1e-9)
