"""Python DataSource connector (paged_json): page-per-partition
planning, schema casting, source-side HWM pushdown, and use as an
incremental merge source."""

from __future__ import annotations

import json
import os

import pytest

from nomba_data_pipeline_spark.sources.pyds import register


@pytest.fixture
def pages(tmp_path):
    d = os.path.join(tmp_path, "api")
    os.makedirs(d)
    rows = [
        [  # page 1
            {"id": 1, "name": "a", "updated_at": "2026-01-01T00:00:00"},
            {"id": 2, "name": "b", "updated_at": "2026-01-02T00:00:00"},
        ],
        [  # page 2
            {"id": 3, "name": "c", "updated_at": "2026-01-03T00:00:00"},
            {"id": 4, "name": None, "updated_at": "2026-01-04T00:00:00"},
        ],
    ]
    for i, page in enumerate(rows):
        with open(os.path.join(d, f"page-{i:04d}.json"), "w") as f:
            for r in page:
                f.write(json.dumps(r) + "\n")
    return d


DDL = "id bigint, name string, updated_at string"


def _read(spark, path, **opts):
    register(spark)
    r = (
        spark.read.format("paged_json")
        .option("path", path)
        .option("schema_ddl", DDL)
    )
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_reads_all_pages_one_partition_each(spark, pages):
    df = _read(spark, pages)
    assert sorted((r.id, r.name) for r in df.collect()) == [
        (1, "a"),
        (2, "b"),
        (3, "c"),
        (4, None),
    ]
    # partition planning: one task per page file
    assert df.rdd.getNumPartitions() == 2


def test_hwm_pushdown_filters_at_source(spark, pages):
    df = _read(
        spark,
        pages,
        tracking_column="updated_at",
        since="2026-01-02T00:00:00",
    )
    assert sorted(r.id for r in df.collect()) == [3, 4]


def test_feeds_incremental_merge(spark, pages, tmp_path):
    """The connector slots into the same load path as every other
    source: HWM read -> merge_upsert -> re-read with the new HWM."""
    from nomba_data_pipeline_spark.operators.merge import ParquetTable

    t = ParquetTable(spark, os.path.join(tmp_path, "tgt"))
    t.merge_upsert(_read(spark, pages), ["id"])
    hwm = t.high_water_mark("updated_at")
    assert hwm == "2026-01-04T00:00:00"
    # a new page arrives with one update + one insert
    with open(os.path.join(pages, "page-0005.json"), "w") as f:
        f.write(json.dumps({"id": 4, "name": "d2", "updated_at": "2026-01-05T00:00:00"}) + "\n")
        f.write(json.dumps({"id": 5, "name": "e", "updated_at": "2026-01-06T00:00:00"}) + "\n")
    delta = _read(spark, pages, tracking_column="updated_at", since=hwm)
    assert delta.count() == 2
    t.merge_upsert(delta, ["id"])
    rows = {r.id: r.name for r in t.read().collect()}
    assert rows == {1: "a", 2: "b", 3: "c", 4: "d2", 5: "e"}


def test_numeric_hwm_pushdown_is_typed(spark, tmp_path):
    """seq=10 must pass a since=9 cut — a lexicographic compare would
    drop it ('10' > '9' is False)."""
    d = os.path.join(tmp_path, "numapi")
    os.makedirs(d)
    with open(os.path.join(d, "p0.json"), "w") as f:
        for seq in (8, 9, 10, 11):
            f.write(json.dumps({"seq": seq, "v": f"r{seq}"}) + "\n")
    register(spark)
    df = (
        spark.read.format("paged_json")
        .option("path", d)
        .option("schema_ddl", "seq bigint, v string")
        .option("tracking_column", "seq")
        .option("since", "9")
        .load()
    )
    assert sorted(r.seq for r in df.collect()) == [10, 11]


def test_unsupported_column_type_rejected_with_clear_message(spark, pages):
    register(spark)
    with pytest.raises(Exception, match="bigint/double/string"):
        (
            spark.read.format("paged_json")
            .option("path", pages)
            .option("schema_ddl", "id int, name string, updated_at string")
            .load()
            .collect()  # reader construction happens at planning
        )


def test_subdirs_and_temporaries_are_not_pages(spark, pages):
    os.makedirs(os.path.join(pages, "archive"))
    with open(os.path.join(pages, "_staging.json"), "w") as f:
        f.write(json.dumps({"id": 99, "name": "x", "updated_at": "z"}) + "\n")
    df = _read(spark, pages)
    assert sorted(r.id for r in df.collect()) == [1, 2, 3, 4]
    assert df.rdd.getNumPartitions() == 2


def test_register_ships_package(spark, monkeypatch):
    """register() must route through shipping.ship_package so workers
    can import the connector class from any driver cwd (the full
    foreign-cwd scenario is exercised by the soak driver-sim)."""
    import nomba_data_pipeline_spark.shipping as shipping

    calls = []
    monkeypatch.setattr(shipping, "ship_package", lambda s: calls.append(s))
    register(spark)
    assert calls == [spark]
