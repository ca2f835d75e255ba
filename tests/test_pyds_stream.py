"""Streaming leg of the paged_json Python DataSource: offset-tracked
change feed over an append-only page directory — exactly-once across
restarts, page-name (not index) offsets, and source-side HWM pushdown
inside micro-batches."""

from __future__ import annotations

import json
import os

import pytest

from nomba_data_pipeline_spark.sources.pyds import register

DDL = "id bigint, name string, updated_at string"


def _write_page(d: str, seq: int, rows: list[dict]) -> None:
    # stage hidden, then rename: a reader listing mid-write must never
    # see a partial page (the contract the reader's listing relies on)
    tmp = os.path.join(d, f"_page-{seq:04d}.json.tmp")
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(tmp, os.path.join(d, f"page-{seq:04d}.json"))


@pytest.fixture
def feed(tmp_path):
    d = os.path.join(tmp_path, "feed")
    os.makedirs(d)
    _write_page(d, 0, [
        {"id": 1, "name": "a", "updated_at": "2026-01-01"},
        {"id": 2, "name": "b", "updated_at": "2026-01-02"},
    ])
    _write_page(d, 1, [
        {"id": 3, "name": "c", "updated_at": "2026-01-03"},
    ])
    return d


def _run_batchwise(spark, src_dir, out_dir, ck_dir, **opts):
    register(spark)
    r = (
        spark.readStream.format("paged_json")
        .option("path", src_dir)
        .option("schema_ddl", DDL)
    )
    for k, v in opts.items():
        r = r.option(k, v)
    q = (
        r.load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _ids(spark, out_dir):
    import glob

    if not glob.glob(os.path.join(out_dir, "*.parquet")):
        return []
    return sorted(
        r.id for r in spark.read.parquet(out_dir).select("id").collect()
    )


def test_stream_reads_all_pages_then_only_new_ones(spark, feed, tmp_path):
    out = os.path.join(tmp_path, "out")
    ck = os.path.join(tmp_path, "ck")
    _run_batchwise(spark, feed, out, ck)
    assert _ids(spark, out) == [1, 2, 3]

    # new pages arrive; same checkpoint -> exactly the delta, no dups
    _write_page(feed, 2, [
        {"id": 4, "name": "d", "updated_at": "2026-01-04"},
        {"id": 5, "name": "e", "updated_at": "2026-01-05"},
    ])
    _run_batchwise(spark, feed, out, ck)
    assert _ids(spark, out) == [1, 2, 3, 4, 5]

    # no new pages -> restart is a no-op
    _run_batchwise(spark, feed, out, ck)
    assert _ids(spark, out) == [1, 2, 3, 4, 5]


def test_stream_offset_is_name_not_index(spark, feed, tmp_path):
    out = os.path.join(tmp_path, "out")
    ck = os.path.join(tmp_path, "ck")
    _run_batchwise(spark, feed, out, ck)
    # committed pages get expired by the producer: the name-based
    # offset must NOT re-read survivors shifted into old positions
    os.remove(os.path.join(feed, "page-0000.json"))
    _write_page(feed, 2, [{"id": 6, "name": "f", "updated_at": "2026-01-06"}])
    _run_batchwise(spark, feed, out, ck)
    assert _ids(spark, out) == [1, 2, 3, 6]


def test_stream_applies_hwm_pushdown(spark, feed, tmp_path):
    out = os.path.join(tmp_path, "out")
    ck = os.path.join(tmp_path, "ck")
    _run_batchwise(
        spark, feed, out, ck,
        tracking_column="updated_at", since="2026-01-01",
    )
    # id=1 sits AT the high-water mark -> excluded (strict >)
    assert _ids(spark, out) == [2, 3]


def _stream_reader(feed):
    from pyspark.sql.types import StructType

    from nomba_data_pipeline_spark.sources.pyds import PagedJsonStreamReader

    schema = (
        StructType()
        .add("id", "long")
        .add("name", "string")
        .add("updated_at", "string")
    )
    return PagedJsonStreamReader(schema, {"path": feed})


def test_latest_offset_never_regresses_on_expiry(feed):
    # producer expires the tail page (or empties the directory): the
    # live listing regresses, the OFFSET must not — a backwards offset
    # would make Spark re-plan already-committed pages as new data
    r = _stream_reader(feed)
    assert r.latestOffset() == {"last_page": "page-0001.json"}
    os.remove(os.path.join(feed, "page-0001.json"))
    assert r.latestOffset() == {"last_page": "page-0001.json"}
    os.remove(os.path.join(feed, "page-0000.json"))
    assert r.latestOffset() == {"last_page": "page-0001.json"}
    # new pages past the floor move it forward again
    _write_page(feed, 2, [{"id": 7, "name": "g", "updated_at": "2026-01-07"}])
    assert r.latestOffset() == {"last_page": "page-0002.json"}


def test_replay_raises_on_expired_uncommitted_page(feed):
    # a planned-but-uncommitted page expired between attempt and replay:
    # silently dropping it would replay a DIFFERENT batch than the one
    # the checkpoint recorded — must raise, not shrink
    r = _stream_reader(feed)
    start, end = {"last_page": ""}, {"last_page": "page-0001.json"}
    assert len(r.partitions(start, end)) == 2
    os.remove(os.path.join(feed, "page-0001.json"))
    with pytest.raises(RuntimeError, match="retention violation"):
        r.partitions(start, end)
    # equal offsets = empty batch, never an error
    assert r.partitions(end, end) == []


def test_replay_raises_on_leading_gap_after_frontier_expiry(feed):
    # age-ordered retention eats the OLDEST pages first: by the time a
    # leading page inside (start, end] can be gone, every page <= the
    # committed frontier is gone too. partitions() must detect that
    # shadow and raise instead of silently planning a smaller batch —
    # the end page being alive is NOT sufficient.
    r = _stream_reader(feed)
    _write_page(feed, 2, [{"id": 7, "name": "g", "updated_at": "2026-01-07"}])
    start = {"last_page": "page-0000.json"}
    end = {"last_page": "page-0002.json"}
    assert len(r.partitions(start, end)) == 2
    # retention advances past the frontier AND into the range: page-0001
    # (leading page of the batch) expires but the end page survives
    os.remove(os.path.join(feed, "page-0000.json"))
    os.remove(os.path.join(feed, "page-0001.json"))
    with pytest.raises(RuntimeError, match="committed frontier"):
        r.partitions(start, end)
    # a live page AT the frontier is a valid witness: with page-0001
    # restored, a batch whose frontier IS page-0001 plans fine even
    # though everything strictly older (page-0000) stays expired
    _write_page(feed, 1, [{"id": 2, "name": "b", "updated_at": "2026-01-02"}])
    assert len(r.partitions({"last_page": "page-0001.json"}, end)) == 1
