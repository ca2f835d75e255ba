"""As-of join — an operator the reference lacks (SURVEY §2.3 'not
present') and Spark has no built-in for; part of the scale-extension
surface.

Semantics: for each left row, attach the most recent right row of the
same key with right.ts <= left.ts (the time-series / point-in-time
lookup used for quotes-to-trades, feature snapshots, etc.).

Spark-first implementation — the sort-merge union trick:
  1. tag right rows (is_right=1) and left rows (is_right=0),
  2. union on (key, ts, is_right),
  3. one window sorted by (ts ASC, is_right DESC): `last(right_payload,
     ignorenulls=True)` carries the latest right row forward,
  4. keep left rows.

Cost: ONE shuffle on the key + one sort — same asymptotics as a
sort-merge join, no theta-join blowup, no per-key driver loop. Skewed
keys are handled by AQE; at 100 TB this is the only shape that works.

The tie policy (right row at exactly left.ts counts) matches DuckDB's
ASOF JOIN `ON l.ts >= r.ts`, which the correctness oracle uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    suffix: str = "asof_",
) -> DataFrame:
    """Left as-of join. `right` should be unique per (on, right_ts); pre-
    dedup it if not (tie-breaking among simultaneous right rows is
    otherwise undefined in every engine).

    NULL semantics match SQL ASOF JOIN (`l.key = r.key AND l.ts >=
    r.ts`): a right row with NULL key or NULL ts can never satisfy the
    predicate, and a NULL-key left row matches nothing — both dropped
    from the right side up front (the window's partitionBy would
    otherwise group NULL keys together and a NULL-ts right row would
    sort first and leak its payload into every row of its key)."""
    l_cols = left.columns
    right = right.filter(F.col(on).isNotNull() & F.col(right_ts).isNotNull())
    # the right payload travels as ONE struct so last(ignorenulls) carries
    # an atomic right ROW — carrying columns independently would stitch
    # values from different right rows whenever the latest one holds a
    # NULL in some payload column (diverging from true as-of semantics)
    r_struct = F.struct(*[F.col(c) for c in right_payload])
    r_struct_type = right.select(r_struct.alias("s")).schema["s"].dataType.simpleString()

    tagged_left = (
        left.withColumn("__ts", F.col(left_ts))
        .withColumn("__is_right", F.lit(0))
        .withColumn("__r", F.lit(None).cast(r_struct_type))
    )
    tagged_right = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__is_right"),
        r_struct.alias("__r"),
    )
    for c in l_cols:
        if c != on:
            tagged_right = tagged_right.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))

    unioned = tagged_left.select(*l_cols, "__ts", "__is_right", "__r").unionByName(
        tagged_right.select(*l_cols, "__ts", "__is_right", "__r")
    )

    # right rows sort before left rows at equal ts -> 'at or before' semantics
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col("__is_right").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        *l_cols,
        "__ts",
        "__is_right",
        F.last("__r", ignorenulls=True).over(w).alias("__rc"),
    )
    return (
        carried.filter(F.col("__is_right") == 0)
        .select(
            *l_cols,
            *[F.col(f"__rc.{c}").alias(f"{suffix}{c}") for c in right_payload],
        )
    )
