"""Bucketed tables: shuffle-free co-located joins and aggregations.

The reference co-locates rows by key at rest — ClickHouse MergeTree
`ORDER BY (plan_id, updated_at)` / `ORDER BY (txn_id, ...)`
(reference setup/init-clickhouse.sql:26,39,51) — so its merges read
sorted runs instead of re-sorting per query. The Spark-first analogue
is hash bucketing: `bucketBy(n, key)` + `sortBy` persisted through the
session catalog. Every later join or aggregation keyed on the bucket
column then skips the Exchange entirely (bucketing IS the shuffle,
paid once at write time), and equality filters on the bucket key prune
to a single bucket at scan time (`SelectedBucketsCount` in the plan).

At 100 TB this is the difference between re-shuffling a fact table for
every one of N downstream joins and shuffling it once at ingest:
bucketed joins are the canonical Spark answer to "repeated big-to-big
joins on a stable key" (dim/fact star schemas, CDC merge targets,
entity-resolution pair generation). Bucket count is a layout decision:
pick `rows_per_bucket ~ tens of millions` so a bucket fits an executor
core's memory; both sides of a join must agree on the count (or be an
integer multiple from Spark 3.1+ with bucket coalescing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist `df` hash-bucketed (and optionally in-bucket sorted) as a
    catalog table. `path` makes it an external table (parquet files at
    that location); omitted, it lands in the session warehouse dir.

    bucketBy requires saveAsTable — the bucketing metadata lives in the
    catalog, which is how later reads know they can elide the Exchange.
    """
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two catalog tables bucketed on the join key. With matching
    bucket counts Catalyst plans a SortMergeJoin with ZERO Exchange on
    either side (pinned by tests/test_plan_shapes.py) — the shuffle was
    prepaid at write time. Plain `spark.table` + `join`: the point is
    that no special read path is needed, the catalog metadata does it.
    """
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
