"""SCD2 check-strategy merge tests (O12) — the reference's hardest
correctness surface (SURVEY §7.4.1)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nomba_data_pipeline_spark.operators.scd2 import current_rows, scd2_merge

SCHEMA = "id int, name string, state string, occupation string"


def ts(lit):
    return F.to_timestamp(F.lit(lit))


@pytest.fixture
def gen1(spark):
    return spark.createDataFrame(
        [(1, "a", "LA", "eng"), (2, "b", "KN", "doc"), (3, "c", "LA", "nurse")], SCHEMA
    )


def test_initial_snapshot_all_open(spark, gen1):
    snap = scd2_merge(None, gen1, "id", ["state", "occupation"], load_ts=ts("2026-01-01"))
    rows = snap.collect()
    assert len(rows) == 3
    assert all(r.valid_to is None for r in rows)
    assert all(r.scd_id is not None for r in rows)


def test_change_close_open_carry(spark, gen1):
    snap = scd2_merge(None, gen1, "id", ["state", "occupation"], load_ts=ts("2026-01-01"))
    batch2 = spark.createDataFrame(
        [(1, "a", "ABJ", "eng"),  # state changed
         (2, "b", "KN", "doc"),   # unchanged
         (4, "d", "IB", "chef")], # new key; id 3 absent
        SCHEMA,
    )
    snap2 = scd2_merge(snap, batch2, "id", ["state", "occupation"], load_ts=ts("2026-02-01"))

    by_key = {}
    for r in snap2.collect():
        by_key.setdefault(r.id, []).append(r)

    # changed: one closed + one open
    v1 = sorted(by_key[1], key=lambda r: str(r.valid_from))
    assert len(v1) == 2
    assert str(v1[0].valid_to).startswith("2026-02-01") and v1[0].state == "LA"
    assert v1[1].valid_to is None and v1[1].state == "ABJ"
    # unchanged: single open row with original valid_from
    assert len(by_key[2]) == 1 and by_key[2][0].valid_to is None
    assert str(by_key[2][0].valid_from).startswith("2026-01-01")
    # absent from batch: carried open (no hard delete, dbt default)
    assert len(by_key[3]) == 1 and by_key[3][0].valid_to is None
    # new key: open
    assert len(by_key[4]) == 1 and by_key[4][0].valid_to is None

    # invariant: exactly one open version per key
    open_counts = (
        current_rows(snap2).groupBy("id").count().filter(F.col("count") > 1).count()
    )
    assert open_counts == 0


def test_null_safe_change_detection(spark):
    g1 = spark.createDataFrame([(1, "a", None, "eng")], SCHEMA)
    snap = scd2_merge(None, g1, "id", ["state", "occupation"], load_ts=ts("2026-01-01"))
    # NULL -> NULL is NOT a change
    snap2 = scd2_merge(snap, g1, "id", ["state", "occupation"], load_ts=ts("2026-02-01"))
    assert snap2.count() == 1
    # NULL -> value IS a change
    g2 = spark.createDataFrame([(1, "a", "LA", "eng")], SCHEMA)
    snap3 = scd2_merge(snap2, g2, "id", ["state", "occupation"], load_ts=ts("2026-03-01"))
    assert snap3.count() == 2
    assert current_rows(snap3).first().state == "LA"


def test_duplicate_key_in_batch_latest_wins(spark):
    g1 = spark.createDataFrame(
        [(1, "a", "LA", "eng", 1), (1, "a", "ABJ", "eng", 2)],
        SCHEMA + ", seq int",
    )
    snap = scd2_merge(
        None, g1, "id", ["state", "occupation"], load_ts=ts("2026-01-01"),
        order_within_batch="seq",
    )
    rows = snap.collect()
    assert len(rows) == 1 and rows[0].state == "ABJ"


def test_hard_delete_closes_absent_keys(spark, gen1):
    from nomba_data_pipeline_spark.operators.scd2 import scd2_apply

    open1, _ = scd2_apply(None, gen1, "id", ["state", "occupation"], load_ts=ts("2026-01-01"))
    batch2 = spark.createDataFrame([(1, "a", "LA", "eng")], SCHEMA)  # ids 2,3 gone
    open2, closed2 = scd2_apply(
        open1, batch2, "id", ["state", "occupation"], load_ts=ts("2026-02-01"),
        hard_delete=True,
    )
    assert sorted(r.id for r in open2.collect()) == [1]
    closed = {r.id: str(r.valid_to)[:10] for r in closed2.collect()}
    assert closed == {2: "2026-02-01", 3: "2026-02-01"}
    # default (reference parity): absentees carried open
    open2b, closed2b = scd2_apply(
        open1, batch2, "id", ["state", "occupation"], load_ts=ts("2026-02-01")
    )
    assert sorted(r.id for r in open2b.collect()) == [1, 2, 3]
    assert closed2b.count() == 0


def test_rerun_same_batch_is_noop(spark, gen1):
    snap = scd2_merge(None, gen1, "id", ["state", "occupation"], load_ts=ts("2026-01-01"))
    snap2 = scd2_merge(snap, gen1, "id", ["state", "occupation"], load_ts=ts("2026-02-01"))
    assert snap2.count() == 3
    assert current_rows(snap2).count() == 3
