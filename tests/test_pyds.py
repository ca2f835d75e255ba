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
