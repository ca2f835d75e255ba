"""snapshot_diff unit tests — null-safe compare semantics the sf
fixture can't exercise (NULL payload columns, include_unchanged)."""

from __future__ import annotations

from nomba_data_pipeline_spark.operators.diff import snapshot_diff

SCHEMA = "id int, a string, b int"


def _result(df):
    return {r.id: (r.change_type, r.n_changed_cols) for r in df.collect()}


def test_added_removed_changed(spark):
    old = spark.createDataFrame(
        [(1, "x", 1), (2, "y", 2), (3, "z", 3)], SCHEMA
    )
    new = spark.createDataFrame(
        [(2, "y", 2), (3, "z", 30), (4, "w", 4)], SCHEMA
    )
    out = _result(snapshot_diff(old, new, ["id"]))
    assert out == {1: ("removed", 0), 3: ("changed", 1), 4: ("added", 0)}


def test_null_to_value_counts_as_change(spark):
    old = spark.createDataFrame([(1, None, 1), (2, None, 2)], SCHEMA)
    new = spark.createDataFrame([(1, "x", 1), (2, None, 2)], SCHEMA)
    out = _result(snapshot_diff(old, new, ["id"]))
    # NULL -> 'x' is a change; NULL -> NULL is not (null-safe equality)
    assert out == {1: ("changed", 1)}


def test_multi_column_change_count(spark):
    old = spark.createDataFrame([(1, "x", 1)], SCHEMA)
    new = spark.createDataFrame([(1, "y", 9)], SCHEMA)
    out = _result(snapshot_diff(old, new, ["id"]))
    assert out == {1: ("changed", 2)}


def test_include_unchanged_and_compare_subset(spark):
    old = spark.createDataFrame([(1, "x", 1), (2, "y", 2)], SCHEMA)
    new = spark.createDataFrame([(1, "x", 99), (2, "y", 2)], SCHEMA)
    # only compare `a` -> the b-column change is invisible
    out = _result(
        snapshot_diff(old, new, ["id"], ["a"], include_unchanged=True)
    )
    assert out == {1: ("unchanged", 0), 2: ("unchanged", 0)}


def test_identical_snapshots_emit_nothing(spark):
    df = spark.createDataFrame([(1, "x", 1)], SCHEMA)
    assert snapshot_diff(df, df, ["id"]).count() == 0


# ---------------------------------------------------------------------------
# property: snapshot_diff agrees with set arithmetic on random tables
# ---------------------------------------------------------------------------
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_table = st.dictionaries(
    st.integers(min_value=0, max_value=15),
    st.tuples(
        st.one_of(st.none(), st.sampled_from(["x", "y", "z"])),
        st.integers(min_value=0, max_value=3),
    ),
    max_size=12,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(old=_table, new=_table)
def test_snapshot_diff_matches_set_arithmetic(spark, old, new):
    def df(d):
        return spark.createDataFrame(
            [(k, a, b) for k, (a, b) in d.items()] or [(None, None, None)], SCHEMA
        ).dropna(subset=["id"])

    out = {
        r.id: (r.change_type, r.n_changed_cols)
        for r in snapshot_diff(df(old), df(new), ["id"]).collect()
    }
    expect = {}
    for k in set(old) | set(new):
        if k not in new:
            expect[k] = ("removed", 0)
        elif k not in old:
            expect[k] = ("added", 0)
        elif old[k] != new[k]:
            n = sum(1 for i in range(2) if old[k][i] != new[k][i])
            expect[k] = ("changed", n)
    assert out == expect
