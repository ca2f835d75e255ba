"""asof_join unit semantics — especially the NULL cases where the
union+window implementation could diverge from SQL ASOF JOIN
(`l.key = r.key AND l.ts >= r.ts`): NULL keys never match and a
NULL-ts right row matches nothing."""

from __future__ import annotations

from datetime import datetime

from nomba_data_pipeline_spark.operators.asof import asof_join


def _dt(s):
    return datetime.fromisoformat(s)


def test_asof_basic_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, _dt("2026-01-01T10:00:00")), (1, _dt("2026-01-01T12:00:00"))],
        "k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _dt("2026-01-01T10:00:00"), "a"), (1, _dt("2026-01-01T11:00:00"), "b")],
        "k long, rts timestamp, v string",
    )
    got = {
        (r.k, r.ts.isoformat(), r.asof_v)
        for r in asof_join(left, right, "k", "ts", "rts", ["v"]).collect()
    }
    # equal ts matches (at-or-before); later left row takes the newer right
    assert got == {
        (1, "2026-01-01T10:00:00", "a"),
        (1, "2026-01-01T12:00:00", "b"),
    }


def test_asof_null_key_and_null_ts_never_match(spark):
    left = spark.createDataFrame(
        [
            (None, _dt("2026-01-01T10:00:00")),  # NULL key: matches nothing
            (2, _dt("2026-01-01T10:00:00")),  # key 2: only NULL-ts right exists
            (1, None),  # NULL left ts: l.ts >= r.ts is never true
            (1, _dt("2026-01-01T10:00:00")),
        ],
        "k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (None, _dt("2026-01-01T09:00:00"), "nullkey"),
            (2, None, "nullts"),
            (1, _dt("2026-01-01T09:00:00"), "ok"),
        ],
        "k long, rts timestamp, v string",
    )
    rows = asof_join(left, right, "k", "ts", "rts", ["v"]).collect()
    by = {(r.k, r.ts.isoformat() if r.ts else None): r.asof_v for r in rows}
    assert by[(None, "2026-01-01T10:00:00")] is None  # not 'nullkey'
    assert by[(2, "2026-01-01T10:00:00")] is None  # not 'nullts'
    assert by[(1, None)] is None
    assert by[(1, "2026-01-01T10:00:00")] == "ok"


def test_range_join_count_handles_map_columns(spark):
    """A left frame carrying a MapType column (e.g. parsed JSON props)
    must work through the content-addressed regroup — maps are not
    groupable, so they ride as key-sorted entry arrays and come back as
    maps."""
    from datetime import datetime

    from nomba_data_pipeline_spark.operators.rangejoin import range_join_count

    left = spark.createDataFrame(
        [
            (1, datetime(2026, 1, 1, 0, 10), {"a": "1"}),
            (1, datetime(2026, 1, 1, 0, 10), {"a": "1"}),  # duplicate row
        ],
        "k long, ts timestamp, props map<string,string>",
    )
    right = spark.createDataFrame(
        [(1, datetime(2026, 1, 1, 0, 5))], "k long, rts timestamp"
    )
    rows = range_join_count(left, right, "k", "ts", "rts", window_seconds=600).collect()
    assert len(rows) == 2  # multiplicity restored
    assert all(r.n_in_range == 1 and r.props == {"a": "1"} for r in rows)
