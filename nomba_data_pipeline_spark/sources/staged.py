"""Staged-file interchange: the reference's S3 JSON stage, Spark-first.

Reference surface (cited into /root/reference):
  S3 sink  — base_loader.py:151-225 streams a generator into one JSON
             array file on MinIO; key pattern {load_type}/{src}_to_{tgt}_{ts}.json
             (:784-786).
  S4 source — base_loader.py:228-250 download; ClickHouse-side read via
             the s3() table function (:326-341).
  S8 GCS  — parallel gs:// branch (base_loader.py:300-301,792-794).

Spark mapping: `df.write.json/parquet/orc(stage_path)` + `spark.read...`
— the path scheme (s3a://, gs://, file://) selects the connector, so
the same code serves S3/GCS/HDFS. JSON is kept for reference parity;
parquet is the default at-rest format (columnar, splittable, pushdown);
ORC is the third Spark-native columnar option for warehouses already
standardized on it (same pushdown/pruning path as parquet); CSV is the
lowest-common-denominator interchange leg (header names only — pass the
schema on read; no pushdown, so never the at-rest format).
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession


def stage_key(load_type: str, source: str, target: str, ts: datetime | None = None) -> str:
    """Reference key pattern {load_type}/{src}_to_{tgt}_{ts} (base_loader.py:784-786)."""
    ts = ts or datetime.now(timezone.utc)
    return f"{load_type}/{source}_to_{target}_{ts.strftime('%Y%m%d_%H%M%S')}"


def write_stage(df: DataFrame, stage_path: str, fmt: str = "parquet") -> None:
    """S3-sink equivalent: distributed write, no driver-side buffering
    (the reference streams through the driver, base_loader.py:190-193 —
    a scale ceiling Spark removes)."""
    writer = df.write.mode("overwrite")
    if fmt == "json":
        writer.json(stage_path)
    elif fmt == "orc":
        writer.orc(stage_path)
    elif fmt == "csv":
        # header row so the stage is self-describing for names (types
        # still need the schema on read — CSV carries none)
        writer.option("header", "true").csv(stage_path)
    else:
        writer.parquet(stage_path)


def read_stage(
    spark: SparkSession, stage_path: str, fmt: str = "parquet", schema=None
) -> DataFrame:
    """S4-source equivalent with the reference's drift tolerance:
    PERMISSIVE mode + corrupt-record column stands in for ClickHouse's
    input_format_skip_unknown_fields (base_loader.py:830-841)."""
    if fmt == "json":
        return (
            spark.read.option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(stage_path)
        )
    if fmt == "orc":
        return spark.read.orc(stage_path)
    if fmt == "csv":
        # schema=None falls back to inference (an extra pass — fine for
        # a stage read-back, wrong for a 100 TB lake table; columnar
        # formats are the at-rest default for exactly this reason)
        reader = spark.read.option("header", "true").option(
            "mode", "PERMISSIVE"
        )
        if schema is not None:
            return reader.schema(schema).csv(stage_path)
        return reader.option("inferSchema", "true").csv(stage_path)
    return spark.read.parquet(stage_path)
