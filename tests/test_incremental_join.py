"""JoinViewTable: incremental maintenance of a materialized fact⋈dim
view — Δ(F⋈D) = ΔF⋈D ∪ F⋈ΔD with a dim-key-bucketed layout so dim
patches rewrite only affected partitions."""

import glob
import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from nomba_data_pipeline_spark.operators.incremental_join import JoinViewTable


def _mk(spark, tmp_path, n_buckets=8):
    fact = spark.createDataFrame(
        [(1, 10, 100.0), (2, 20, 200.0), (3, 10, 300.0), (4, 99, 400.0)],
        "fk long, dk long, amount double",
    )
    dim = spark.createDataFrame(
        [(10, "alpha", 1.0), (20, "beta", 2.0), (30, "gamma", 3.0)],
        "dk long, name string, score double",
    )
    v = JoinViewTable(
        spark, os.path.join(tmp_path, "view"),
        fact_key=["fk"], dim_key="dk", dim_cols=["name", "score"],
        n_buckets=n_buckets,
    )
    v.build(fact, dim)
    return v, fact, dim


def _rows(v):
    return {
        r["fk"]: (r["dk"], r["amount"], r["name"], r["score"])
        for r in v.read().collect()
    }


def test_build_is_left_join(spark, tmp_path):
    v, fact, dim = _mk(spark, str(tmp_path))
    got = _rows(v)
    assert got[1] == (10, 100.0, "alpha", 1.0)
    assert got[4] == (99, 400.0, None, None)  # unmatched key -> NULL attrs
    assert len(got) == 4


def test_dim_delta_patches_only_affected_buckets(spark, tmp_path):
    v, fact, dim = _mk(spark, str(tmp_path))
    # snapshot per-partition file sets before the patch
    before = {
        d: sorted(os.listdir(d))
        for d in glob.glob(os.path.join(str(tmp_path), "view", "__dim_bucket=*"))
    }
    patch = spark.createDataFrame(
        [(10, "ALPHA2", 11.0)], "dk long, name string, score double"
    )
    v.apply_dim_delta(patch)
    got = _rows(v)
    assert got[1] == (10, 100.0, "ALPHA2", 11.0)
    assert got[3] == (10, 300.0, "ALPHA2", 11.0)
    assert got[2] == (20, 200.0, "beta", 2.0)  # untouched key keeps attrs
    after = {
        d: sorted(os.listdir(d))
        for d in glob.glob(os.path.join(str(tmp_path), "view", "__dim_bucket=*"))
    }
    # only the bucket(s) dk=10 hashes into may change; every other
    # partition directory must be byte-untouched (same file names)
    changed = [d for d in before if before[d] != after.get(d, [])]
    assert len(changed) >= 1
    unaffected = [d for d in before if d not in changed]
    for d in unaffected:
        assert before[d] == after[d]


def test_late_dim_arrival_fills_nulls(spark, tmp_path):
    v, fact, dim = _mk(spark, str(tmp_path))
    patch = spark.createDataFrame(
        [(99, "late", 9.9)], "dk long, name string, score double"
    )
    v.apply_dim_delta(patch)
    assert _rows(v)[4] == (99, 400.0, "late", 9.9)


def test_fact_delta_upserts_and_replays_idempotently(spark, tmp_path):
    v, fact, dim = _mk(spark, str(tmp_path))
    delta = spark.createDataFrame(
        [(2, 20, 222.0), (5, 30, 500.0)], "fk long, dk long, amount double"
    )
    v.apply_fact_delta(delta, dim)
    v.apply_fact_delta(delta, dim)  # replay converges, no dup keys
    got = _rows(v)
    assert len(got) == 5
    assert got[2] == (20, 222.0, "beta", 2.0)
    assert got[5] == (30, 500.0, "gamma", 3.0)


def test_fact_delta_dim_key_migration_moves_buckets(spark, tmp_path):
    v, fact, dim = _mk(spark, str(tmp_path))
    # fk=1 switches dim from 10 -> 20: the row must leave dk=10's bucket
    # and appear once in dk=20's, enriched with the NEW dim attrs
    delta = spark.createDataFrame(
        [(1, 20, 150.0)], "fk long, dk long, amount double"
    )
    v.apply_fact_delta(delta, dim)
    got = _rows(v)
    assert len(got) == 4
    assert got[1] == (20, 150.0, "beta", 2.0)
    stored = v._table.read()
    assert stored.filter(F.col("fk") == 1).count() == 1


def test_composite_fact_key(spark, tmp_path):
    """fact_key may be composite (e.g. orderkey+linenumber): upserts
    replace on the full tuple, and dim patches are key-agnostic."""
    fact = spark.createDataFrame(
        [(1, 1, 10, 100.0), (1, 2, 20, 200.0), (2, 1, 10, 300.0)],
        "ok long, ln int, dk long, amt double",
    )
    dim = spark.createDataFrame([(10, "a"), (20, "b")], "dk long, nm string")
    v = JoinViewTable(
        spark, os.path.join(str(tmp_path), "view"),
        fact_key=["ok", "ln"], dim_key="dk", dim_cols=["nm"], n_buckets=4,
    )
    v.build(fact, dim)
    delta = spark.createDataFrame(
        [(1, 2, 10, 222.0), (3, 1, 20, 400.0)], "ok long, ln int, dk long, amt double"
    )
    v.apply_fact_delta(delta, dim)
    got = {(r["ok"], r["ln"]): (r["amt"], r["nm"]) for r in v.read().collect()}
    assert got == {
        (1, 1): (100.0, "a"),
        (1, 2): (222.0, "a"),  # replaced on the composite key + migrated dim
        (2, 1): (300.0, "a"),
        (3, 1): (400.0, "b"),
    }
    v.apply_dim_delta(spark.createDataFrame([(10, "A")], "dk long, nm string"))
    got = {(r["ok"], r["ln"]): r["nm"] for r in v.read().collect()}
    assert got == {(1, 1): "A", (1, 2): "A", (2, 1): "A", (3, 1): "b"}


def test_dim_delta_validation(spark, tmp_path):
    v, fact, dim = _mk(spark, str(tmp_path))
    with pytest.raises(ValueError, match="full replacement rows"):
        v.apply_dim_delta(spark.createDataFrame([(10, "x")], "dk long, name string"))
    with pytest.raises(ValueError, match="NULL join keys"):
        v.apply_dim_delta(
            spark.createDataFrame(
                [(None, "x", 1.0)], "dk long, name string, score double"
            )
        )
    # an unsquashed CDC batch (two replacement rows for one key) would
    # fan out every matching fact row — must refuse, not duplicate
    with pytest.raises(ValueError, match="duplicate join keys"):
        v.apply_dim_delta(
            spark.createDataFrame(
                [(10, "x", 1.0), (10, "y", 2.0)],
                "dk long, name string, score double",
            )
        )


def test_fact_delta_on_unbuilt_view_refuses(spark, tmp_path):
    """apply_fact_delta must not bootstrap the table through
    merge_upsert's create-when-absent branch: that would skip the
    parameter sidecar, breaking open() and leaving _validate_meta
    permanently vacuous."""
    v = JoinViewTable(
        spark, os.path.join(str(tmp_path), "view"),
        fact_key=["fk"], dim_key="dk", dim_cols=["name"],
    )
    delta = spark.createDataFrame([(1, 10, 1.0)], "fk long, dk long, amount double")
    dim = spark.createDataFrame([(10, "alpha")], "dk long, name string")
    with pytest.raises(ValueError, match="not built yet"):
        v.apply_fact_delta(delta, dim)


def test_retire_dim_keys_tombstones_enrichment(spark, tmp_path):
    """Dim DELETE via the documented tombstone pattern: retiring a key
    nulls the enrichment columns of its view rows through the same
    bucketed rewrite, other rows untouched; a later re-insert of the
    key re-enriches."""
    v, fact, dim = _mk(spark, str(tmp_path))
    v.retire_dim_keys(
        spark.createDataFrame([(10,), (10,), (30,)], "dk long")  # dups squashed
    )
    got = _rows(v)
    assert got[1] == (10, 100.0, None, None)  # retired -> tombstoned
    assert got[3] == (10, 300.0, None, None)
    assert got[2] == (20, 200.0, "beta", 2.0)  # untouched
    assert got[4] == (99, 400.0, None, None)
    # resurrection: the key returns with fresh attributes
    v.apply_dim_delta(
        spark.createDataFrame([(10, "alpha9", 9.0)], "dk long, name string, score double")
    )
    got = _rows(v)
    assert got[1] == (10, 100.0, "alpha9", 9.0)
    assert got[3] == (10, 300.0, "alpha9", 9.0)


_dim_row = st.tuples(st.integers(10, 14), st.integers(0, 9))
# dk range extends past the dim's (10..14) so some fact keys are dimless
_fact_row = st.tuples(st.integers(1, 8), st.integers(10, 16), st.integers(0, 99))


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    f1=st.lists(_fact_row, min_size=1, max_size=8),
    d1=st.lists(_dim_row, min_size=1, max_size=4),
    fd=st.lists(_fact_row, min_size=0, max_size=5),
    dd=st.lists(_dim_row, min_size=0, max_size=3),
)
def test_random_maintenance_sequences_equal_declarative_join(
    spark, tmp_path_factory, f1, d1, fd, dd
):
    """PROPERTY: for any base build + (dim delta, fact delta) sequence,
    the maintained view equals the from-scratch left join of the final
    states — including dimless fact keys, key migration, and patches
    touching keys with no fact rows."""
    import os

    td = str(tmp_path_factory.mktemp("jv"))

    def facts(rows):
        return spark.createDataFrame(
            [(k, dk, float(a)) for k, dk, a in rows], "fk long, dk long, amt double"
        ).dropDuplicates(["fk"])

    def dims(rows):
        return spark.createDataFrame(
            [(dk, f"n{p}") for dk, p in rows], "dk long, nm string"
        ).dropDuplicates(["dk"])

    fact, dim = facts(f1), dims(d1)
    v = JoinViewTable(
        spark, os.path.join(td, "v"), ["fk"], "dk", ["nm"], n_buckets=4
    )
    v.build(fact, dim)
    dim_final = dim
    if dd:
        patch = dims(dd)
        v.apply_dim_delta(patch)
        dim_final = dim.join(patch.select("dk"), "dk", "anti").unionByName(patch)
    fact_final = fact
    if fd:
        delta = facts(fd)
        v.apply_fact_delta(delta, dim_final)
        fact_final = fact.join(delta.select("fk"), "fk", "anti").unionByName(delta)
    got = {r["fk"]: (r["dk"], r["amt"], r["nm"]) for r in v.read().collect()}
    expect = {
        r["fk"]: (r["dk"], r["amt"], r["nm"])
        for r in fact_final.join(dim_final, "dk", "left").collect()
    }
    assert got == expect


def test_meta_sidecar_blocks_divergent_layout_and_open_reconstructs(
    spark, tmp_path
):
    """The bucket layout is part of the view's identity: maintenance
    constructed with a different n_buckets would mis-scope the rewrite,
    so the sidecar written at build must refuse it; open() reconstructs
    the exact parameters instead."""
    v, fact, dim = _mk(spark, str(tmp_path), n_buckets=8)
    patch = spark.createDataFrame(
        [(10, "X", 0.0)], "dk long, name string, score double"
    )
    wrong = JoinViewTable(
        spark, os.path.join(str(tmp_path), "view"),
        fact_key=["fk"], dim_key="dk", dim_cols=["name", "score"],
        n_buckets=16,
    )
    with pytest.raises(ValueError, match="mis-scope"):
        wrong.apply_dim_delta(patch)
    with pytest.raises(ValueError, match="mis-scope"):
        wrong.apply_fact_delta(fact.limit(1), dim)
    opened = JoinViewTable.open(spark, os.path.join(str(tmp_path), "view"))
    assert opened.n_buckets == 8 and opened.dim_cols == ["name", "score"]
    opened.apply_dim_delta(patch)
    assert _rows(opened)[1] == (10, 100.0, "X", 0.0)


def test_cli_view_lifecycle(spark, tmp_path, capsys):
    """CLI verbs drive the same lifecycle; patch-dim/apply-fact reopen
    from the sidecar (no layout re-supply)."""
    import json as _json

    from nomba_data_pipeline_spark.__main__ import main

    fact_p = os.path.join(str(tmp_path), "fact")
    dim_p = os.path.join(str(tmp_path), "dim")
    patch_p = os.path.join(str(tmp_path), "patch")
    view_p = os.path.join(str(tmp_path), "view")
    spark.createDataFrame(
        [(1, 10, 100.0), (2, 20, 200.0)], "fk long, dk long, amt double"
    ).write.parquet(fact_p)
    spark.createDataFrame(
        [(10, "alpha"), (20, "beta")], "dk long, nm string"
    ).write.parquet(dim_p)
    spark.createDataFrame([(10, "ALPHA")], "dk long, nm string").write.parquet(
        patch_p
    )

    rc = main([
        "view", "build", "--path", view_p, "--fact", fact_p, "--dim", dim_p,
        "--fact-key", "fk", "--dim-key", "dk", "--dim-cols", "nm",
        "--n-buckets", "4",
    ])
    assert rc == 0
    assert _json.loads(capsys.readouterr().out.strip().splitlines()[-1])["rows"] == 2

    rc = main(["view", "patch-dim", "--path", view_p, "--dim", patch_p])
    assert rc == 0
    capsys.readouterr()
    got = {
        r["fk"]: r["nm"]
        for r in JoinViewTable.open(spark, view_p).read().collect()
    }
    assert got == {1: "ALPHA", 2: "beta"}

    rc = main(["view", "stats", "--path", view_p])
    assert rc == 0
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["rows"] == 2

    # retire-dim: a parquet of retired keys tombstones their view rows
    retire_p = os.path.join(str(tmp_path), "retire")
    spark.createDataFrame([(10,)], "dk long").write.parquet(retire_p)
    rc = main(["view", "retire-dim", "--path", view_p, "--dim", retire_p])
    assert rc == 0
    assert _json.loads(capsys.readouterr().out.strip().splitlines()[-1])["keys"] == 1
    got = {
        r["fk"]: r["nm"]
        for r in JoinViewTable.open(spark, view_p).read().collect()
    }
    assert got == {1: None, 2: "beta"}


def test_streaming_foreachbatch_maintains_view_across_restarts(spark, tmp_path):
    """Structured-Streaming leg: a file-source fact stream maintains the
    view through foreachBatch(apply_fact_delta). availableNow drains
    what exists, the checkpoint survives a restart (second run applies
    ONLY the new files), and a replayed batch converges (upsert
    semantics) — the enrichment view stays equal to the declarative
    join of everything that has arrived."""
    import os

    feed = os.path.join(str(tmp_path), "feed")
    ck = os.path.join(str(tmp_path), "ck")
    os.makedirs(feed, exist_ok=True)

    dim = spark.createDataFrame(
        [(10, "alpha"), (20, "beta")], "dk long, nm string"
    )
    base = spark.createDataFrame([(1, 10, 100.0)], "fk long, dk long, amt double")
    v = JoinViewTable(
        spark, os.path.join(str(tmp_path), "view"),
        fact_key=["fk"], dim_key="dk", dim_cols=["nm"], n_buckets=4,
    )
    v.build(base, dim)

    def _arrive(name, rows):
        spark.createDataFrame(rows, "fk long, dk long, amt double").coalesce(
            1
        ).write.mode("overwrite").parquet(os.path.join(feed, name))

    def _drain():
        q = (
            spark.readStream.schema("fk long, dk long, amt double")
            .option("recursiveFileLookup", "true")
            .parquet(feed)
            .writeStream.foreachBatch(
                lambda df, bid: v.apply_fact_delta(df, dim)
            )
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _arrive("b1", [(2, 20, 200.0), (3, 10, 300.0)])
    _drain()
    got = {r["fk"]: (r["dk"], r["amt"], r["nm"]) for r in v.read().collect()}
    assert got == {
        1: (10, 100.0, "alpha"),
        2: (20, 200.0, "beta"),
        3: (10, 300.0, "alpha"),
    }

    # restart: only the new file is planned; fk=2 is REPLACED (updated
    # amount + migrated dim key), fk=4 inserted
    _arrive("b2", [(2, 10, 222.0), (4, 20, 400.0)])
    _drain()
    got = {r["fk"]: (r["dk"], r["amt"], r["nm"]) for r in v.read().collect()}
    assert got == {
        1: (10, 100.0, "alpha"),
        2: (10, 222.0, "alpha"),
        3: (10, 300.0, "alpha"),
        4: (20, 400.0, "beta"),
    }
    # replayed batch converges: re-applying b2's content changes nothing
    v.apply_fact_delta(
        spark.createDataFrame(
            [(2, 10, 222.0), (4, 20, 400.0)], "fk long, dk long, amt double"
        ),
        dim,
    )
    again = {r["fk"]: (r["dk"], r["amt"], r["nm"]) for r in v.read().collect()}
    assert again == got


def test_maintained_view_equals_declarative_join(spark, tmp_path):
    """After an arbitrary mixed sequence, the maintained view must equal
    fact_final LEFT JOIN dim_final computed from scratch."""
    v, fact, dim = _mk(spark, str(tmp_path))
    dim_patch = spark.createDataFrame(
        [(10, "A", 1.5), (30, "G", 3.5)], "dk long, name string, score double"
    )
    fact_delta = spark.createDataFrame(
        [(4, 30, 444.0), (6, 10, 600.0)], "fk long, dk long, amount double"
    )
    v.apply_dim_delta(dim_patch)
    dim_final = (
        dim.join(dim_patch.select("dk"), "dk", "anti").unionByName(dim_patch)
    )
    v.apply_fact_delta(fact_delta, dim_final)
    fact_final = (
        fact.join(fact_delta.select("fk"), "fk", "anti").unionByName(fact_delta)
    )
    expect = {
        r["fk"]: (r["dk"], r["amount"], r["name"], r["score"])
        for r in fact_final.join(
            dim_final.select("dk", "name", "score"), "dk", "left"
        ).collect()
    }
    assert _rows(v) == expect


def test_rows_for_dim_keys_bucket_pruned_extract(spark, tmp_path):
    v, fact, dim = _mk(spark, str(tmp_path))
    got = {
        r["fk"]
        for r in v.rows_for_dim_keys(
            spark.createDataFrame([(10,), (10,), (777,)], "dk long")
        ).collect()
    }
    assert got == {1, 3}  # only dk=10's fact rows; unknown key matches none
    assert v.rows_for_dim_keys(
        spark.createDataFrame([], "dk long")
    ).count() == 0


def test_chain_dim_patch_star_schema(spark, tmp_path):
    """Snowflake chain: view1 = fact⋈D1 (bucketed by the D1 key),
    view2 = view1⋈D2 (bucketed by the D2 key that arrived as one of
    view1's enrichment columns). A D1 patch that also REASSIGNS a
    fact's D2 key propagates through chain_dim_patch: view1's buckets
    are patched, exactly the changed rows re-enter view2 as a fact
    delta, and the D2-key migration moves them to the new holder
    bucket. Final view2 equals the declarative 3-way join."""
    from nomba_data_pipeline_spark.operators.incremental_join import chain_dim_patch

    fact = spark.createDataFrame(
        [(1, 10, 5.0), (2, 10, 6.0), (3, 20, 7.0), (4, 30, 8.0)],
        "fk long, d1k long, amt double",
    )
    d1 = spark.createDataFrame(
        [(10, 100, "a"), (20, 100, "b"), (30, 200, "c")],
        "d1k long, d2k long, tag string",
    )
    d2 = spark.createDataFrame(
        [(100, "SEG-X"), (200, "SEG-Y")], "d2k long, seg string"
    )
    v1 = JoinViewTable(
        spark, os.path.join(str(tmp_path), "v1"),
        fact_key=["fk"], dim_key="d1k", dim_cols=["d2k", "tag"], n_buckets=8,
    )
    v1.build(fact, d1)
    v2 = JoinViewTable(
        spark, os.path.join(str(tmp_path), "v2"),
        fact_key=["fk"], dim_key="d2k", dim_cols=["seg"], n_buckets=8,
    )
    v2.build(v1.read(), d2)

    # D1 patch: d1k=10 reassigned to d2k=200 with a new tag
    patch = spark.createDataFrame(
        [(10, 200, "a2")], "d1k long, d2k long, tag string"
    )
    chain_dim_patch(v1, v2, patch, d2)

    d1_final = spark.createDataFrame(
        [(10, 200, "a2"), (20, 100, "b"), (30, 200, "c")],
        "d1k long, d2k long, tag string",
    )
    expect = {
        r["fk"]: (r["d2k"], r["tag"], r["seg"])
        for r in fact.join(d1_final, "d1k", "left")
        .join(d2, "d2k", "left")
        .collect()
    }
    got = {
        r["fk"]: (r["d2k"], r["tag"], r["seg"]) for r in v2.read().collect()
    }
    assert got == expect
    assert got[1] == (200, "a2", "SEG-Y")  # migrated + re-enriched
    assert got[3] == (100, "b", "SEG-X")  # untouched chain rows intact


def test_rows_for_dim_keys_plan_is_partition_pruned(spark, tmp_path):
    """PLAN PIN: the chained-propagation extract must read ONLY the
    buckets its keys hash into (PartitionFilters on __dim_bucket) and
    broadcast the key set — a full-view scan here would break the
    star-chain cost bound at 100 TB."""
    v, fact, dim = _mk(spark, str(tmp_path))
    df = v.rows_for_dim_keys(spark.createDataFrame([(10,)], "dk long"))
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    # one key -> Catalyst folds isin([b]) to equality; several -> IN
    assert pf and "__dim_bucket" in pf[0] and (" IN " in pf[0] or " = " in pf[0]), pf
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_composite_dim_key(spark, tmp_path):
    """COMPOSITE dim keys (e.g. (region, tier)): build, patch, tombstone
    and NULL-component refusal all operate on the full key tuple; a
    patch rewrites only the buckets its key TUPLES hash into."""
    fact = spark.createDataFrame(
        [(1, "eu", 1, 10.0), (2, "eu", 2, 20.0), (3, "us", 1, 30.0), (4, "ap", 9, 40.0)],
        "fk long, region string, tier int, amt double",
    )
    dim = spark.createDataFrame(
        [("eu", 1, "E1"), ("eu", 2, "E2"), ("us", 1, "U1")],
        "region string, tier int, label string",
    )
    v = JoinViewTable(
        spark, os.path.join(str(tmp_path), "view"),
        fact_key=["fk"], dim_key=["region", "tier"], dim_cols=["label"],
        n_buckets=8,
    )
    v.build(fact, dim)
    got = {r["fk"]: r["label"] for r in v.read().collect()}
    assert got == {1: "E1", 2: "E2", 3: "U1", 4: None}

    # patch one key TUPLE: (eu, 1) only — (eu, 2) must keep its label
    v.apply_dim_delta(
        spark.createDataFrame([("eu", 1, "E1v2")], "region string, tier int, label string")
    )
    got = {r["fk"]: r["label"] for r in v.read().collect()}
    assert got == {1: "E1v2", 2: "E2", 3: "U1", 4: None}

    # a NULL in ANY key component is refused (never matches)
    with pytest.raises(ValueError, match="NULL join keys"):
        v.apply_dim_delta(
            spark.createDataFrame(
                [("eu", None, "x")], "region string, tier int, label string"
            )
        )
    # duplicate TUPLE refused
    with pytest.raises(ValueError, match="duplicate join keys"):
        v.apply_dim_delta(
            spark.createDataFrame(
                [("eu", 1, "a"), ("eu", 1, "b")],
                "region string, tier int, label string",
            )
        )

    # tombstone one tuple; extract by tuple stays bucket-scoped
    v.retire_dim_keys(spark.createDataFrame([("us", 1)], "region string, tier int"))
    got = {r["fk"]: r["label"] for r in v.read().collect()}
    assert got[3] is None and got[1] == "E1v2"
    sub = v.rows_for_dim_keys(spark.createDataFrame([("eu", 2)], "region string, tier int"))
    assert {r["fk"] for r in sub.collect()} == {2}

    # open() reconstructs the composite key from the sidecar
    opened = JoinViewTable.open(spark, os.path.join(str(tmp_path), "view"))
    assert opened.dim_key == ["region", "tier"]
    v2 = JoinViewTable(
        spark, os.path.join(str(tmp_path), "view"),
        fact_key=["fk"], dim_key=["tier", "region"], dim_cols=["label"],
        n_buckets=8,
    )
    with pytest.raises(ValueError, match="mis-scope"):
        v2.apply_dim_delta(
            spark.createDataFrame([("eu", 1, "z")], "region string, tier int, label string")
        )


def test_streaming_dim_cdc_patches_view(spark, tmp_path):
    """Streaming DIM-side leg: a file-source dim-CDC stream maintains
    the view through foreachBatch — each micro-batch is SQUASHED to one
    replacement row per key (keep-latest by the CDC sequence; an
    unsquashed batch trips apply_dim_delta's duplicate refusal by
    design), the checkpoint survives a restart, and a replayed patch
    converges. The view tracks the declarative join against the latest
    dim state."""
    import os

    from pyspark.sql.window import Window

    feed = os.path.join(str(tmp_path), "dimfeed")
    ck = os.path.join(str(tmp_path), "ck")
    os.makedirs(feed, exist_ok=True)

    fact = spark.createDataFrame(
        [(1, 10, 100.0), (2, 20, 200.0), (3, 10, 300.0)],
        "fk long, dk long, amt double",
    )
    dim = spark.createDataFrame([(10, "alpha"), (20, "beta")], "dk long, nm string")
    v = JoinViewTable(
        spark, os.path.join(str(tmp_path), "view"),
        fact_key=["fk"], dim_key="dk", dim_cols=["nm"], n_buckets=4,
    )
    v.build(fact, dim)

    def _patch_batch(df, _bid):
        if df.isEmpty():
            return
        w = Window.partitionBy("dk").orderBy(
            F.desc("seq"), F.desc(F.xxhash64("nm"))
        )
        squashed = (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("dk", "nm")
        )
        v.apply_dim_delta(squashed)

    def _arrive(name, rows):
        spark.createDataFrame(rows, "dk long, nm string, seq long").coalesce(
            1
        ).write.mode("overwrite").parquet(os.path.join(feed, name))

    def _drain():
        q = (
            spark.readStream.schema("dk long, nm string, seq long")
            .option("recursiveFileLookup", "true")
            .parquet(feed)
            .writeStream.foreachBatch(_patch_batch)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # one batch carries TWO updates for dk=10 — squash keeps seq=2
    _arrive("b1", [(10, "a-v1", 1), (10, "a-v2", 2), (20, "b-v1", 1)])
    _drain()
    got = {r["fk"]: r["nm"] for r in v.read().collect()}
    assert got == {1: "a-v2", 2: "b-v1", 3: "a-v2"}

    # restart drains only the new file
    _arrive("b2", [(20, "b-v2", 3)])
    _drain()
    got = {r["fk"]: r["nm"] for r in v.read().collect()}
    assert got == {1: "a-v2", 2: "b-v2", 3: "a-v2"}

    # replay converges
    v.apply_dim_delta(spark.createDataFrame([(20, "b-v2")], "dk long, nm string"))
    assert {r["fk"]: r["nm"] for r in v.read().collect()} == got


_cdim_row = st.tuples(st.integers(0, 2), st.integers(0, 2), st.integers(0, 9))
_cfact_row = st.tuples(st.integers(1, 8), st.integers(0, 3), st.integers(0, 3))


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    f1=st.lists(_cfact_row, min_size=1, max_size=6),
    d1=st.lists(_cdim_row, min_size=1, max_size=4),
    dd=st.lists(_cdim_row, min_size=0, max_size=3),
)
def test_random_composite_key_sequences_equal_declarative_join(
    spark, tmp_path_factory, f1, d1, dd
):
    """PROPERTY (composite keys): maintained view == from-scratch left
    join on the full (a, b) tuple after any dim-patch sequence —
    including fact tuples with no dim row and patches to tuples no fact
    row carries. The fact key range deliberately exceeds the dim range
    so dimless tuples always occur."""
    import os

    td = str(tmp_path_factory.mktemp("jvc"))

    def facts(rows):
        return spark.createDataFrame(
            [(k, a, b, float(k)) for k, a, b in rows],
            "fk long, a int, b int, amt double",
        ).dropDuplicates(["fk"])

    def dims(rows):
        return spark.createDataFrame(
            [(a, b, f"n{p}") for a, b, p in rows], "a int, b int, nm string"
        ).dropDuplicates(["a", "b"])

    fact, dim = facts(f1), dims(d1)
    v = JoinViewTable(
        spark, os.path.join(td, "v"), ["fk"], ["a", "b"], ["nm"], n_buckets=4
    )
    v.build(fact, dim)
    dim_final = dim
    if dd:
        patch = dims(dd)
        v.apply_dim_delta(patch)
        dim_final = dim.join(
            patch.select("a", "b"), ["a", "b"], "anti"
        ).unionByName(patch)
    got = {r["fk"]: (r["a"], r["b"], r["nm"]) for r in v.read().collect()}
    expect = {
        r["fk"]: (r["a"], r["b"], r["nm"])
        for r in fact.join(dim_final, ["a", "b"], "left").collect()
    }
    assert got == expect


def test_cli_chain_patch(spark, tmp_path, capsys):
    """CLI chain-patch drives chain_dim_patch across two sidecar-opened
    views."""
    import json as _json

    from nomba_data_pipeline_spark.__main__ import main
    from nomba_data_pipeline_spark.operators.incremental_join import JoinViewTable as JV

    fact = spark.createDataFrame(
        [(1, 10, 5.0), (2, 20, 6.0)], "fk long, d1k long, amt double"
    )
    d1 = spark.createDataFrame(
        [(10, 100, "a"), (20, 200, "b")], "d1k long, d2k long, tag string"
    )
    d2 = spark.createDataFrame([(100, "X"), (200, "Y")], "d2k long, seg string")
    v1 = JV(spark, os.path.join(str(tmp_path), "v1"), ["fk"], "d1k", ["d2k", "tag"], 4)
    v1.build(fact, d1)
    v2 = JV(spark, os.path.join(str(tmp_path), "v2"), ["fk"], "d2k", ["seg"], 4)
    v2.build(v1.read(), d2)

    patch_p = os.path.join(str(tmp_path), "patch")
    d2_p = os.path.join(str(tmp_path), "d2")
    spark.createDataFrame(
        [(10, 200, "a2")], "d1k long, d2k long, tag string"
    ).write.parquet(patch_p)
    d2.write.parquet(d2_p)

    rc = main([
        "view", "chain-patch", "--path", os.path.join(str(tmp_path), "v1"),
        "--dim", patch_p,
        "--downstream", os.path.join(str(tmp_path), "v2"),
        "--downstream-dim", d2_p,
    ])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == 2
    got = {r["fk"]: (r["tag"], r["seg"]) for r in v2.read().collect()}
    assert got == {1: ("a2", "Y"), 2: ("b", "Y")}


# ---------------------------------------------------------------------------
# lifecycle evolution verbs (round 12): evolve_dim_cols / rebucket /
# depth-N propagate_dim_patch
# ---------------------------------------------------------------------------
def test_evolve_dim_cols_widens_without_rebuild(spark, tmp_path):
    """A dim gaining an enrichment column must not force an O(F⋈D)
    rebuild: evolve_dim_cols NULL-fills it (layout preserved), updates
    the sidecar so patches carry it, and open() reconstructs the
    evolved contract."""
    v, fact, dim = _mk(spark, str(tmp_path))
    evolved_dim = dim.withColumn("region", F.concat(F.lit("r-"), F.col("name")))
    # BEFORE the evolve, a patch carrying the new column is refused
    with pytest.raises(ValueError, match="full replacement"):
        v.apply_dim_delta(
            spark.createDataFrame(
                [(10, "A", 1.0, "r-A")],
                "dk long, name string, score double, region string",
            ).drop("name")
        )
    added = v.evolve_dim_cols(evolved_dim)
    assert added == ["region"]
    got = v.read()
    assert got.filter(F.col("region").isNotNull()).count() == 0  # NULL-filled
    # layout preserved: still hive-bucketed
    assert glob.glob(os.path.join(str(tmp_path), "view", "__dim_bucket=*"))
    # a full-dim backfill now flows through the ordinary patch path
    v.apply_dim_delta(evolved_dim)
    rows = {r["fk"]: r["region"] for r in v.read().collect()}
    assert rows[1] == "r-alpha" and rows[2] == "r-beta"
    assert rows[4] is None  # dimless fact row keeps NULL attrs
    # sidecar updated: open() carries the evolved contract
    opened = JoinViewTable.open(spark, os.path.join(str(tmp_path), "view"))
    assert opened.dim_cols == ["name", "score", "region"]
    # idempotent: evolving again with the same schema is a no-op
    assert opened.evolve_dim_cols(evolved_dim) == []


def test_evolve_dim_cols_refuses_fact_collision_and_skips_void(spark, tmp_path):
    v, fact, dim = _mk(spark, str(tmp_path))
    with pytest.raises(ValueError, match="collides with a fact-side"):
        v.evolve_dim_cols(dim.withColumn("amount", F.lit(1.0)))
    # VOID (all-NULL, typeless) columns are skipped until a concrete type
    assert v.evolve_dim_cols(dim.withColumn("maybe", F.lit(None))) == []


def test_rebucket_rescopes_maintenance(spark, tmp_path):
    """rebucket(n) is the grow-the-layout verb: one O(view) rewrite +
    sidecar update; content is unchanged and subsequent patches are
    bucket-scoped under the NEW modulus."""
    v, fact, dim = _mk(spark, str(tmp_path), n_buckets=2)
    before = _rows(v)
    v.rebucket(16)
    assert _rows(v) == before
    opened = JoinViewTable.open(spark, os.path.join(str(tmp_path), "view"))
    assert opened.n_buckets == 16
    # stale-modulus handles are refused by the sidecar as usual
    stale = JoinViewTable(
        spark, os.path.join(str(tmp_path), "view"),
        fact_key=["fk"], dim_key="dk", dim_cols=["name", "score"], n_buckets=2,
    )
    with pytest.raises(ValueError, match="mis-scope"):
        stale.apply_dim_delta(
            spark.createDataFrame([(10, "X", 0.0)], "dk long, name string, score double")
        )
    # patches under the new modulus stay partition-scoped
    dirs = {
        d: sorted(os.listdir(d))
        for d in glob.glob(os.path.join(str(tmp_path), "view", "__dim_bucket=*"))
    }
    opened.apply_dim_delta(
        spark.createDataFrame([(10, "X", 0.0)], "dk long, name string, score double")
    )
    after = {
        d: sorted(os.listdir(d))
        for d in glob.glob(os.path.join(str(tmp_path), "view", "__dim_bucket=*"))
    }
    changed = [d for d in dirs if dirs[d] != after.get(d, [])]
    assert len(changed) >= 1
    for d in dirs:
        if d not in changed:
            assert dirs[d] == after[d]
    assert _rows(opened)[1] == (10, 100.0, "X", 0.0)
    # same-modulus rebucket is a no-op
    opened.rebucket(16)
    assert _rows(opened)[1] == (10, 100.0, "X", 0.0)


def test_rebucket_interrupted_refuses_then_resumes(spark, tmp_path):
    """FAULT INJECTION: an intent marker (crash mid-rebucket) makes
    every other maintenance verb refuse — a stored modulus that
    disagrees with the on-disk layout would silently mis-scope — and
    re-running rebucket() completes the rewrite and clears it."""
    v, fact, dim = _mk(spark, str(tmp_path), n_buckets=2)
    marker = os.path.join(str(tmp_path), "view._view_meta.rebucket-intent")
    open(marker, "w").close()  # simulate the crash window
    fresh = JoinViewTable.open(spark, os.path.join(str(tmp_path), "view"))
    with pytest.raises(ValueError, match="interrupted rebucket"):
        fresh.apply_dim_delta(
            spark.createDataFrame([(10, "X", 0.0)], "dk long, name string, score double")
        )
    fresh.rebucket(8)  # completes the interrupted rewrite
    assert not os.path.exists(marker)
    assert _rows(fresh) == _rows(v)
    opened = JoinViewTable.open(spark, os.path.join(str(tmp_path), "view"))
    assert opened.n_buckets == 8
    opened.apply_dim_delta(
        spark.createDataFrame([(10, "X", 0.0)], "dk long, name string, score double")
    )
    assert _rows(opened)[1] == (10, 100.0, "X", 0.0)


def test_propagate_dim_patch_depth3_equals_declarative_join(spark, tmp_path):
    """Depth-3 snowflake chain F⋈D1 → ⋈D2 → ⋈D3: a D1 patch that also
    REASSIGNS downstream keys propagates bucket-scoped through all
    three views and the final view equals the declarative 4-way join —
    the depth-N generalization chain_dim_patch covered only for 2."""
    from nomba_data_pipeline_spark.operators.incremental_join import (
        propagate_dim_patch,
    )

    fact = spark.createDataFrame(
        [(1, 10, 5.0), (2, 20, 6.0), (3, 10, 7.0), (4, 30, 8.0)],
        "fk long, d1k long, amt double",
    )
    d1 = spark.createDataFrame(
        [(10, 100, "a"), (20, 200, "b"), (30, 100, "c")],
        "d1k long, d2k long, tag string",
    )
    d2 = spark.createDataFrame(
        [(100, 1000, "X"), (200, 2000, "Y")], "d2k long, d3k long, seg string"
    )
    d3 = spark.createDataFrame([(1000, "N"), (2000, "S")], "d3k long, zone string")
    v1 = JoinViewTable(spark, os.path.join(str(tmp_path), "v1"), ["fk"], "d1k", ["d2k", "tag"], 4)
    v1.build(fact, d1)
    v2 = JoinViewTable(spark, os.path.join(str(tmp_path), "v2"), ["fk"], "d2k", ["d3k", "seg"], 4)
    v2.build(v1.read(), d2)
    v3 = JoinViewTable(spark, os.path.join(str(tmp_path), "v3"), ["fk"], "d3k", ["zone"], 4)
    v3.build(v2.read(), d3)

    # D1 patch: d1k=10 re-tagged AND reassigned to d2k=200 (so its rows
    # must migrate buckets in v2 and re-enrich down to v3's zone)
    patch = spark.createDataFrame(
        [(10, 200, "a2")], "d1k long, d2k long, tag string"
    )
    propagate_dim_patch([v1, v2, v3], patch, [d2, d3])

    d1_final = spark.createDataFrame(
        [(10, 200, "a2"), (20, 200, "b"), (30, 100, "c")],
        "d1k long, d2k long, tag string",
    )
    expect = {
        r["fk"]: (r["tag"], r["seg"], r["zone"])
        for r in fact.join(d1_final, "d1k", "left")
        .join(d2, "d2k", "left")
        .join(d3, "d3k", "left")
        .collect()
    }
    got = {
        r["fk"]: (r["tag"], r["seg"], r["zone"]) for r in v3.read().collect()
    }
    assert got == expect
    assert got[1] == ("a2", "Y", "S")  # migrated all the way down

    # arity validation
    with pytest.raises(ValueError, match="one CURRENT dim per"):
        propagate_dim_patch([v1, v2, v3], patch, [d2])
    with pytest.raises(ValueError, match="at least two"):
        propagate_dim_patch([v1], patch, [])
