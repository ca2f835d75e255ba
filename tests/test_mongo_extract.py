"""S1 composed Mongo-stage extraction: option semantics + the
incremental HWM ingest loop end-to-end (stage -> extract -> upsert)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from nomba_data_pipeline_spark.operators.merge import ParquetTable
from nomba_data_pipeline_spark.sources.mongo import (
    extract_mongo_stage,
    mongo_ingest,
    stage_mongo_dump,
)

DOCS = [
    # (_id.$oid, doc_id, updated_at, status, nested{a,b}, secret)
    ("a1", 1, "2024-01-01 10:00:00.000001", "ok", {"a": 1, "b": "x"}, "s1"),
    ("a2", 2, "2024-01-02 10:00:00.000002", "ok", {"a": 2, "b": "y"}, "s2"),
    ("a3", 3, "2024-01-03 10:00:00.000003", "bad", {"a": 3, "b": "z"}, "s3"),
]

SCHEMA = (
    "_id struct<`$oid`: string>, doc_id long, updated_at string, "
    "status string, nested struct<a: long, b: string>, secret string"
)


def _stage(spark, tmp_path, docs, name="stage"):
    path = os.path.join(str(tmp_path), name)
    df = spark.createDataFrame(
        [(({"$oid": o}), i, u, s, n, sec) for o, i, u, s, n, sec in docs], SCHEMA
    ).withColumn("updated_at", F.to_timestamp("updated_at"))
    stage_mongo_dump(df, path)
    return path


def test_extract_composes_all_options(spark, tmp_path):
    path = _stage(spark, tmp_path, DOCS)
    out = extract_mongo_stage(
        spark,
        path,
        tracking_column="updated_at",
        last_value="2024-01-02 00:00:00",
        query_filter=F.col("status") == "ok",
        fields_to_delete=["secret", "nested.b"],
        flatten_nested=True,
    )
    assert sorted(out.columns) == ["_id_oid", "doc_id", "nested_a", "status", "updated_at"]
    rows = out.collect()
    assert [(r._id_oid, r.doc_id, r.nested_a) for r in rows] == [("a2", 2, 2)]
    # microsecond precision survived the JSON stage round-trip
    assert rows[0].updated_at.microsecond == 2


def test_extract_projection_prunes_before_processing(spark, tmp_path):
    path = _stage(spark, tmp_path, DOCS)
    out = extract_mongo_stage(
        spark, path, projection=["doc_id", "nested"], flatten_nested=True
    )
    assert sorted(out.columns) == ["doc_id", "nested_a", "nested_b"]
    assert out.count() == 3


def test_mongo_ingest_incremental_hwm_loop(spark, tmp_path):
    """Two-round CDC: round 2 re-stages with one new + one updated doc;
    the HWM filter ingests only those, and a rerun is a no-op upsert."""
    path = _stage(spark, tmp_path, DOCS)
    t = ParquetTable(spark, os.path.join(str(tmp_path), "warehouse", "docs"))
    kwargs = dict(
        keys=["doc_id"],
        tracking_column="updated_at",
        fields_to_delete=["secret", "nested.b"],
        flatten_nested=True,
    )
    assert mongo_ingest(spark, path, t, **kwargs) == 3

    docs2 = DOCS + [
        ("a2", 2, "2024-01-05 09:00:00", "fixed", {"a": 22, "b": "y2"}, "s2"),
        ("a4", 4, "2024-01-06 09:00:00", "new", {"a": 4, "b": "w"}, "s4"),
    ]
    _stage(spark, tmp_path, docs2)
    # >= HWM re-reads the boundary doc (reference $gte semantics); the
    # upsert makes that idempotent, so only 2 rows actually change
    assert mongo_ingest(spark, path, t, **kwargs) == 3
    state = {r.doc_id: (r.status, r.nested_a) for r in t.read().collect()}
    assert state == {1: ("ok", 1), 2: ("fixed", 22), 3: ("bad", 3), 4: ("new", 4)}
    # steady-state rerun: same stage, HWM now at the max -> boundary only
    assert mongo_ingest(spark, path, t, **kwargs) == 1
    assert {r.doc_id: (r.status, r.nested_a) for r in t.read().collect()} == state


def test_mongo_ingest_other_load_modes(spark, tmp_path):
    """full / dedup / snapshot modes dispatch to the matching writers
    (reference load_type param)."""
    path = _stage(spark, tmp_path, DOCS)
    # full: overwrite everything, twice = same
    t_full = ParquetTable(spark, os.path.join(str(tmp_path), "wh", "full"))
    assert mongo_ingest(spark, path, t_full, mode="full", flatten_nested=True) == 3
    assert mongo_ingest(spark, path, t_full, mode="full", flatten_nested=True) == 3
    assert t_full.read().count() == 3

    # dedup: stage contains two versions of doc 2 -> keep latest
    docs_dup = DOCS + [("a2", 2, "2024-01-09 00:00:00", "late", {"a": 99, "b": "z"}, "s")]
    path2 = _stage(spark, tmp_path, docs_dup, name="stage_dup")
    t_d = ParquetTable(spark, os.path.join(str(tmp_path), "wh", "dedup"))
    mongo_ingest(
        spark, path2, t_d, keys=["doc_id"], tracking_column="updated_at",
        mode="dedup", flatten_nested=True,
    )
    state = {r.doc_id: r.status for r in t_d.read().collect()}
    assert state[2] == "late" and len(state) == 3

    # snapshot: same-day re-append does not duplicate
    t_s = ParquetTable(spark, os.path.join(str(tmp_path), "wh", "snap"))
    mongo_ingest(spark, path, t_s, mode="snapshot", flatten_nested=True)
    mongo_ingest(spark, path, t_s, mode="snapshot", flatten_nested=True)
    assert t_s.read().count() == 3
    assert "ingest_date" in t_s.read().columns


def test_strip_dollar_collision_is_safe(spark):
    """A doc with both '$type' and 'type' must not produce two columns
    named 'type' (AMBIGUOUS_REFERENCE downstream) — the '$' falls back
    to '_' on collision."""
    from nomba_data_pipeline_spark.sources.mongo import _strip_dollar_names

    df = spark.createDataFrame([(1, 2)], "`$type` int, type int")
    out = _strip_dollar_names(df)
    assert sorted(out.columns) == ["_type", "type"]
    assert out.first()._type == 1 and out.first().type == 2


def test_stage_preserves_all_null_columns(spark, tmp_path):
    """A field that is null in EVERY staged row must survive the JSON
    round-trip as a column (default ignoreNullFields drops the key from
    every line and with it the column from the inferred schema)."""
    import os

    from nomba_data_pipeline_spark.sources.mongo import (
        extract_mongo_stage,
        stage_mongo_dump,
    )

    stage = os.path.join(tmp_path, "nullstage")
    df = spark.createDataFrame(
        [(1, None), (2, None)], "id bigint, secret string"
    )
    stage_mongo_dump(df, stage)
    back = extract_mongo_stage(spark, stage, projection=["id", "secret"])
    assert sorted(back.columns) == ["id", "secret"]
    assert back.filter("secret IS NULL").count() == 2
