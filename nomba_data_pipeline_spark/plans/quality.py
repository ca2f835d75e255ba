"""Data-quality assertions — the reference's dbt schema tests (§2.12).

Reference: `unique` + `not_null` declarations in
models/staging/schema.yml:9-84 and models/marts/schema.yml:6-97, run
with `dbt build` (dbt_assets.py:24-27). Expressed as DataFrame checks;
each returns the violation count so callers can assert == 0.

Both checks are single aggregations (one shuffle for unique, none for
not_null beyond the scan) — they scale linearly and run after each
model materialization, like dbt tests do.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unique_violations(df: DataFrame, col: str) -> int:
    """Number of duplicated key groups (0 = unique holds)."""
    return df.groupBy(col).count().filter(F.col("count") > 1).count()


def not_null_violations(df: DataFrame, col: str) -> int:
    """Number of NULL rows (0 = not_null holds)."""
    return df.filter(F.col(col).isNull()).count()


def accepted_values_violations(df: DataFrame, col: str, values: list) -> int:
    """Rows whose value is outside the accepted set (NULLs pass — pair
    with not_null when NULL is also invalid). dbt's accepted_values."""
    return df.filter(F.col(col).isNotNull() & ~F.col(col).isin(values)).count()


@dataclass
class QualitySpec:
    unique: list[str] = field(default_factory=list)
    not_null: list[str] = field(default_factory=list)
    accepted_values: dict[str, list] = field(default_factory=dict)
    min_rows: int = 0  # volume floor: catch an accidentally-empty build

    def check(self, df: DataFrame) -> dict[str, int]:
        """Run all declared checks; returns {check_name: violations}."""
        results: dict[str, int] = {}
        for c in self.unique:
            results[f"unique:{c}"] = unique_violations(df, c)
        for c in self.not_null:
            results[f"not_null:{c}"] = not_null_violations(df, c)
        for c, vals in self.accepted_values.items():
            results[f"accepted_values:{c}"] = accepted_values_violations(df, c, vals)
        if self.min_rows > 0:
            results["min_rows"] = max(0, self.min_rows - df.count())
        return results

    def assert_ok(self, df: DataFrame, model: str = "") -> None:
        bad = {k: v for k, v in self.check(df).items() if v > 0}
        if bad:
            raise AssertionError(f"quality failures on {model or 'model'}: {bad}")
