"""Bucketed range (interval) join — another operator absent from both
the reference (SURVEY §2.3) and Spark's built-in equi-join set.

Problem: `l JOIN r ON l.key = r.key AND r.ts BETWEEN l.ts - D AND l.ts`
executes as a theta join in naive Spark (broadcast nested loop or a
post-filtered equi-join on key only — the latter explodes on hot keys).

Spark-first fix: quantize time into D-width buckets. A right row lands
in exactly one bucket; each left row probes its own bucket and the
previous one (the interval spans at most two). The join becomes a pure
equi-join on (key, bucket) — shuffle-hash/SMJ friendly, AQE-skew
splittable — followed by the exact range filter. Join fan-out is
bounded by bucket population, never by key population.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nomba_data_pipeline_spark.functions.timeutil import epoch_seconds


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    window_seconds: int,
    count_alias: str = "n_in_range",
) -> DataFrame:
    """Per left row: count right rows of the same key with
    right.ts in [left.ts - window, left.ts). Zero-match rows kept.

    Determinism: the regroup after the 2-bucket probe explode must
    reassemble exactly one output row per INPUT row. A per-row uid from
    monotonically_increasing_id is NOT retry-safe when the caller's
    frame derives from a shuffle (a retried task can reassign uids and
    split/merge counts). Instead the left side is content-addressed:
    fully-duplicate rows are pre-aggregated with their multiplicity,
    counts are computed once per DISTINCT row, and the multiplicity is
    re-exploded at the end — identical rows have identical counts, so
    the multiset result is exact and every step is deterministic. The
    pre-aggregation replaces (not adds to) the old uid regroup shuffle.
    """
    # epoch_seconds, not a direct double cast: TIMESTAMP_NTZ columns
    # (parquet timestamp[us] without tz) reject CAST(.. AS DOUBLE)
    bucket = lambda c: F.floor(epoch_seconds(c) / window_seconds)  # noqa: E731

    r = right.select(
        F.col(on).alias("__rk"),
        F.col(right_ts).alias("__rts"),
        bucket(right_ts).alias("__bucket"),
    )
    # MapType columns are not groupable — swap each for its key-sorted
    # entry array (canonical + groupable) and restore at the end, so a
    # left frame carrying e.g. parsed JSON props still works
    map_cols = [
        f.name
        for f in left.schema.fields
        if f.dataType.typeName() == "map"
    ]
    grouped_left = left
    for c in map_cols:
        grouped_left = grouped_left.withColumn(
            c, F.array_sort(F.map_entries(F.col(c)))
        )
    lg = grouped_left.groupBy(*left.columns).agg(F.count(F.lit(1)).alias("__mult"))
    l = lg.withColumn(
        "__probe", F.explode(F.array(bucket(left_ts) - 1, bucket(left_ts)))
    )

    joined = l.join(
        r,
        (l[on] == r["__rk"]) & (l["__probe"] == r["__bucket"]),
        "left",
    )
    in_range = (
        F.col("__rts").isNotNull()
        & (F.col("__rts") >= F.col(left_ts) - F.expr(f"INTERVAL {window_seconds} SECONDS"))
        & (F.col("__rts") < F.col(left_ts))
    )
    out = (
        joined.groupBy(*[F.col(c) for c in left.columns], F.col("__mult"))
        .agg(F.sum(F.when(in_range, 1).otherwise(0)).alias(count_alias))
        .withColumn("__copy", F.explode(F.sequence(F.lit(1), F.col("__mult"))))
        .drop("__copy", "__mult")
    )
    for c in map_cols:
        out = out.withColumn(c, F.map_from_entries(F.col(c)))
    return out
