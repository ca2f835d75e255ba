"""applyInPandasWithState operator test: running totals accumulate
across micro-batches; timeout eviction emits a final row.

Note: a stateful stream with ProcessingTimeTimeout stays alive to fire
timeouts (it is an always-on operator in production), so the test polls
the sink and stops the query explicitly instead of awaiting natural
termination."""

from __future__ import annotations

import os
import time
from datetime import datetime

from pyspark.sql import types as T

from nomba_data_pipeline_spark.streaming.stateful import running_user_totals

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def test_running_totals_accumulate_across_batches(spark, tmp_path):
    src = os.path.join(tmp_path, "src")
    ckpt = os.path.join(tmp_path, "ckpt")
    # two files -> with maxFilesPerTrigger=1 they arrive as two micro-batches
    spark.createDataFrame(
        [(1, datetime(2026, 1, 1, 0, 0), 1.0), (2, datetime(2026, 1, 1, 0, 0), 5.0)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(1, datetime(2026, 1, 1, 0, 1), 2.0)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        deadline = time.time() + 120
        last = {}
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM running_totals").collect()
            last = {}
            for r in rows:  # later emissions overwrite earlier ones
                last[r.user_id] = (r.n_events, r.total_value)
            if last.get(1) == (2, 3.0) and last.get(2) == (1, 5.0):
                break
            if q.exception() is not None:
                raise AssertionError(str(q.exception()))
            time.sleep(1)
        assert last.get(1) == (2, 3.0), last
        assert last.get(2) == (1, 5.0), last
    finally:
        q.stop()
