"""Right-to-be-forgotten erasure across the medallion: subject rows
vanish from staging, dims, facts, AND split-SCD2 closed history;
non-subject data is untouched; replay removes nothing; an audit
manifest is written."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from nomba_data_pipeline_spark.plans import models as M
from nomba_data_pipeline_spark.plans.cdc_sim import simulate_user_updates
from nomba_data_pipeline_spark.plans.pipeline import build_pipeline
from tests.conftest import SF_SMALL


@pytest.fixture
def warehouse(tmp_path):
    return os.path.join(tmp_path, "wh")


def _build_with_history(spark, warehouse):
    """Run the pipeline twice with a CDC update in between so the
    SCD2 snapshot has closed history to erase from."""
    build_pipeline(spark, warehouse, SF_SMALL).run()
    override = {
        "stg_users": lambda s, sf: simulate_user_updates(
            M.stg_users(s, sf), fraction=0.3
        )
    }
    runner = build_pipeline(spark, warehouse, SF_SMALL, source_override=override)
    runner.run()
    return runner


def _subject_with_history(runner):
    """Pick a user that has closed SCD2 versions AND transactions."""
    closed = runner.table("users_snapshot__closed").read()
    fact = runner.table("fact_transactions").read()
    cand = (
        closed.select("user_id")
        .join(fact.select("user_id").distinct(), "user_id", "left_semi")
        .limit(1)
        .collect()
    )
    assert cand, "fixture must yield a user with history and txns"
    return cand[0]["user_id"]


def test_erasure_removes_subject_everywhere(spark, warehouse):
    runner = _build_with_history(spark, warehouse)
    uid = _subject_with_history(runner)
    pre_counts = {
        name: runner.table(name).read().count()
        for name in (
            "stg_users",
            "users_snapshot__open",
            "users_snapshot__closed",
            "dim_users",
            "stg_plans",
            "dim_plans",
            "fact_transactions",
            "fact_transactions",
        )
    }
    subject_plans = {
        r["plan_id"]
        for r in runner.table("stg_plans")
        .read()
        .filter(F.col("user_id") == uid)
        .collect()
    }
    subject_txns = (
        runner.table("fact_transactions")
        .read()
        .filter(F.col("plan_id").isin(list(subject_plans)))
        .count()
        if subject_plans
        else 0
    )

    removed = runner.erase_subject([uid], erasure_id="req-001")

    # subject gone from every user_id-bearing table
    for name in (
        "stg_users",
        "users_snapshot__open",
        "dim_users",
        "stg_plans",
        "dim_plans",
        "fact_transactions",
    ):
        t = runner.table(name).read()
        assert t.filter(F.col("user_id") == uid).count() == 0, name
    # closed history purged too (the table may even disappear whole)
    closed_t = runner.table("users_snapshot__closed")
    if closed_t.exists():
        assert (
            closed_t.read().filter(F.col("user_id") == uid).count() == 0
        )
    # transactions on the subject's plans are gone
    if subject_plans:
        assert (
            runner.table("fact_transactions")
            .read()
            .filter(F.col("plan_id").isin(list(subject_plans)))
            .count()
            == 0
        )
    assert removed["stg_users"] == 1
    assert removed["users_snapshot__closed"] >= 1
    assert removed["fact_transactions"] == subject_txns

    # everyone else untouched: per-table count drop == rows_removed
    for name, pre in pre_counts.items():
        t = runner.table(name)
        post = t.read().count() if t.exists() else 0
        assert pre - post == removed[name], name

    # audit manifest
    with open(os.path.join(warehouse, "_erasures", "req-001.json")) as f:
        manifest = json.load(f)
    assert manifest["user_ids"] == [uid]
    assert manifest["rows_removed"] == removed


def test_erasure_is_idempotent(spark, warehouse):
    runner = _build_with_history(spark, warehouse)
    uid = _subject_with_history(runner)
    runner.erase_subject([uid], erasure_id="req-001")
    snap = {
        name: runner.table(name).read().count()
        for name in ("stg_users", "dim_plans", "fact_transactions")
    }
    removed2 = runner.erase_subject([uid], erasure_id="req-001-replay")
    assert all(v == 0 for v in removed2.values()), removed2
    for name, n in snap.items():
        assert runner.table(name).read().count() == n


def test_erased_warehouse_still_reads_and_reruns(spark, warehouse):
    """After erasure the SCD2 layout must stay consistent: read_model
    reassembles, and an unchanged pipeline rerun does not resurrect
    the subject (their row re-enters from source as a fresh user —
    acceptable — but history stays purged; here we rerun with the
    subject REMOVED from the source, the realistic post-erasure
    state)."""
    runner = _build_with_history(spark, warehouse)
    uid = _subject_with_history(runner)
    runner.erase_subject([uid], erasure_id="req-002")
    snap = runner.read_model("users_snapshot")
    assert snap.filter(F.col("user_id") == uid).count() == 0

    override = {
        "stg_users": lambda s, sf: M.stg_users(s, sf).filter(
            F.col("user_id") != uid
        )
    }
    runner2 = build_pipeline(spark, warehouse, SF_SMALL, source_override=override)
    runner2.run()
    assert (
        runner2.read_model("users_snapshot")
        .filter(F.col("user_id") == uid)
        .count()
        == 0
    )


def test_bulk_erasure_stages_plan_mapping(spark, warehouse):
    """Bulk erasure: the subject->plan_id mapping is STAGED to a
    parquet sidecar, never collect()ed to the driver — a large cohort
    is bounded by storage. A replay reuses the staged mapping (it must
    survive stg_plans' own deletion for crash replayability)."""
    runner = _build_with_history(spark, warehouse)
    # large synthetic cohort: every user in the warehouse plus tens of
    # thousands of unknown ids (an erasure list routinely includes ids
    # the warehouse never saw)
    known = [
        r["user_id"]
        for r in runner.table("stg_users").read().select("user_id").collect()
    ]
    cohort = known + list(range(10_000_000, 10_050_000))
    removed = runner.erase_subject(cohort, "bulk-1")

    map_dir = os.path.join(warehouse, "_erasures", "bulk-1.plan_ids")
    assert os.path.isdir(map_dir), "plan mapping must be staged to parquet"
    assert removed["stg_users"] == len(known)
    assert runner.table("stg_users").read().count() == 0
    assert runner.table("fact_transactions").read().count() == 0
    assert not runner.table("users_snapshot__closed").exists()

    # replay: idempotent, reuses the staged mapping, removes nothing
    again = runner.erase_subject(cohort, "bulk-1")
    assert all(v == 0 for v in again.values()), again


def test_erasure_reaches_join_view_marts(spark, tmp_path):
    """A maintained join_view mart keyed by user_id must not retain
    erased subjects — and the erasure must be BUCKET-SCOPED: subject
    rows vanish, untouched buckets keep their exact files, the hive
    bucket layout survives, and an erase-everything still leaves a
    readable table."""
    import glob as _glob

    from nomba_data_pipeline_spark.plans.runner import ModelSpec, PipelineRunner

    wh = os.path.join(tmp_path, "wh2")
    r = PipelineRunner(spark, wh, SF_SMALL)
    r.register(
        ModelSpec(
            name="f",
            fn=lambda s, _: s.createDataFrame(
                [(i, i % 5 + 1, float(i)) for i in range(50)],
                "txn long, user_id long, amt double",
            ),
            materialization="incremental", upsert_key=["txn"],
            tracking_column="amt",
        )
    )
    r.register(
        ModelSpec(
            name="d",
            fn=lambda s, _: s.createDataFrame(
                [(u, f"u{u}", u) for u in range(1, 6)],
                "user_id long, nm string, u int",
            ),
            materialization="incremental", upsert_key=["user_id"],
            tracking_column="u",
        )
    )
    r.register(
        ModelSpec(
            name="mart", fn=None, materialization="join_view",
            view_fact="f", view_dim="d", view_dim_key="user_id",
            view_dim_cols=["nm"], view_dim_tracking="u",
            upsert_key=["txn"], tracking_column="amt", view_buckets=8,
        )
    )
    r.run()
    mart_dir = os.path.join(wh, "mart")
    before = {
        d: sorted(os.listdir(d))
        for d in _glob.glob(os.path.join(mart_dir, "__dim_bucket=*"))
    }

    removed = r.erase_subject([2], "jv-1")
    assert removed["mart"] == 10
    mart = r.read_model("mart")
    assert mart.filter(F.col("user_id") == 2).count() == 0
    assert mart.count() == 40
    after = {
        d: sorted(os.listdir(d))
        for d in _glob.glob(os.path.join(mart_dir, "__dim_bucket=*"))
    }
    changed = [d for d in before if before[d] != after.get(d, [])]
    assert len(changed) == 1, "only user 2's bucket may be touched"
    for d in before:
        if d not in changed:
            assert before[d] == after[d]

    # erase everyone else: table stays readable with zero rows
    r.erase_subject([1, 3, 4, 5], "jv-2")
    assert r.table("mart").read().count() == 0


def test_erase_all_then_reload_restores_clean_layout(spark, tmp_path):
    """REGRESSION (ADVICE r11): an all-rows erasure keeps a partitioned
    table readable as one empty FLAT file; the next partition-scoped
    load used to swap hive dirs in around that root file, leaving a
    mixed layout Spark's partition discovery rejects. The next load
    must heal the residue and come back readable — for both a plain
    partitioned incremental table and a join_view mart."""
    import glob as _glob

    from nomba_data_pipeline_spark.plans.runner import ModelSpec, PipelineRunner

    wh = os.path.join(tmp_path, "wh3")
    fact_src = {"rows": [(i, i % 2 + 1, float(i), 1) for i in range(8)]}
    dim_src = {"rows": [(1, "u1", 1), (2, "u2", 1)]}

    def mk():
        r = PipelineRunner(spark, wh, SF_SMALL)
        r.register(
            ModelSpec(
                name="fact_transactions",
                fn=lambda s, _: s.createDataFrame(
                    fact_src["rows"], "txn long, user_id long, amt double, v int"
                ),
                materialization="incremental", upsert_key=["txn"],
                tracking_column="v", partition_by=["user_id"],
            )
        )
        r.register(
            ModelSpec(
                name="d",
                fn=lambda s, _: s.createDataFrame(
                    dim_src["rows"], "user_id long, nm string, u int"
                ),
                materialization="incremental", upsert_key=["user_id"],
                tracking_column="u",
            )
        )
        r.register(
            ModelSpec(
                name="mart", fn=None, materialization="join_view",
                view_fact="fact_transactions", view_dim="d",
                view_dim_key="user_id", view_dim_cols=["nm"],
                view_dim_tracking="u", upsert_key=["txn"],
                tracking_column="v", view_buckets=4,
            )
        )
        return r

    mk().run()
    # erase EVERY subject -> both partitioned tables fall back to the
    # one-empty-flat-file shape (schema stays readable)
    mk().erase_subject([1, 2], "all-gone")
    r = mk()
    assert r.table("fact_transactions").read().count() == 0
    assert r.table("mart").read().count() == 0

    # new data arrives; the next loads are partition-scoped writes
    fact_src["rows"] = fact_src["rows"] + [(100, 1, 1000.0, 2)]
    dim_src["rows"] = dim_src["rows"] + [(1, "u1b", 2)]
    r2 = mk()
    r2.run()
    # both tables readable again, clean hive layouts, no flat residue
    for name, pat in (("fact_transactions", "user_id=*"), ("mart", "__dim_bucket=*")):
        tdir = os.path.join(wh, name)
        got = spark.read.parquet(tdir)
        assert got.count() >= 1, name
        assert _glob.glob(os.path.join(tdir, pat)), name
        flat = [
            f for f in os.listdir(tdir)
            if not f.startswith(("_", ".")) and os.path.isfile(os.path.join(tdir, f))
        ]
        assert flat == [], name
    got = {r_["txn"]: r_["nm"] for r_ in r2.read_model("mart").collect()}
    assert got == {100: "u1b"}
