"""Guard against testdata dtype drift.

The grading driver regenerates the parquet fixtures between rounds, and
the physical timestamp type has already changed once (TIMESTAMP(NANOS)
-> timestamp[us]-no-tz, which Spark scans as TIMESTAMP_NTZ). That drift
silently broke every epoch-arithmetic site for two rounds because the
failure surfaced only at the driver. These tests pin the contract
in-suite: whatever flavor `events.ts` arrives in, it must be a
timestamp our helpers can do epoch math on.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nomba_data_pipeline_spark.catalog import load_table
from nomba_data_pipeline_spark.functions.timeutil import epoch_seconds
from tests.conftest import SF_SMALL

SUPPORTED_TS_TYPES = (T.TimestampType, T.TimestampNTZType)


def test_events_ts_is_supported_timestamp(spark):
    events = load_table(spark, SF_SMALL, "events")
    dt = events.schema["ts"].dataType
    assert isinstance(dt, SUPPORTED_TS_TYPES), (
        f"events.ts arrived as {dt}; epoch arithmetic and the catalog "
        "nanos shim only cover TIMESTAMP / TIMESTAMP_NTZ — update "
        "catalog.load_table before anything downstream runs"
    )


@pytest.mark.parametrize("flavor", ["timestamp", "timestamp_ntz"])
def test_epoch_seconds_resolves_on_both_timestamp_flavors(spark, flavor):
    events = load_table(spark, SF_SMALL, "events").withColumn(
        "ts", F.col("ts").cast(flavor)
    )
    row = (
        events.select(epoch_seconds("ts").alias("es"), F.col("ts"))
        .orderBy("ts")
        .first()
    )
    # session tz is UTC, so both flavors yield the same wall-time epoch
    import calendar

    wall = row.ts.replace(tzinfo=None)
    expected = calendar.timegm(wall.timetuple()) + wall.microsecond / 1e6
    assert row.es == pytest.approx(expected, abs=1e-6)


def test_epoch_seconds_keeps_microseconds(spark):
    events = load_table(spark, SF_SMALL, "events")
    frac = events.select(
        (epoch_seconds("ts") - F.floor(epoch_seconds("ts"))).alias("f")
    ).agg(F.max("f").alias("mx")).first()
    # fixtures carry sub-second precision; a truncating implementation
    # would return exactly 0 here
    assert frac.mx > 0


def test_graded_row_column_contract(spark):
    """Column/type contract for every fixture column the graded rows
    depend on. The driver regenerates fixtures between rounds; a
    renamed or retyped column should fail HERE with a readable message,
    not as 65 opaque driver mismatches."""
    expectations = {
        "documents": {
            "doc_id": (T.LongType,),
            "text": (T.StringType,),
            "lang": (T.StringType,),
            "source": (T.StringType,),
            "n_chars": (T.LongType, T.IntegerType),
        },
        "embeddings": {
            "vec_id": (T.LongType,),
            "embedding": (T.ArrayType,),
            "label": (T.LongType, T.IntegerType, T.StringType),
        },
        "events": {
            "event_id": (T.LongType,),
            "user_id": (T.LongType,),
            "event_type": (T.StringType,),
            "value": (T.DoubleType,),
            "props": (T.StringType,),
        },
        "orders": {
            "o_custkey": (T.LongType,),
            "o_orderstatus": (T.StringType,),
            "o_orderpriority": (T.StringType,),
            "o_totalprice": (T.DoubleType, T.DecimalType),
        },
    }
    for table, cols in expectations.items():
        schema = {f.name: f.dataType for f in load_table(spark, SF_SMALL, table).schema}
        for col, ok_types in cols.items():
            assert col in schema, f"{table}.{col} vanished from fixtures"
            assert isinstance(schema[col], ok_types), (
                f"{table}.{col} arrived as {schema[col]}; graded rows "
                f"expect one of {[t.__name__ for t in ok_types]}"
            )


def test_graded_row_value_contract(spark):
    """VALUE contract for graded rows that name fixture values: the
    theta cohort-overlap row intersects the 'click' and 'purchase'
    cohorts, and its witness semantics assume both cohorts exist and
    share users (a regenerated fixture without them would surface as
    an opaque driver mismatch — fail here instead, loudly)."""
    ev = load_table(spark, SF_SMALL, "events")
    types = {r[0] for r in ev.select("event_type").distinct().collect()}
    assert {"click", "purchase"} <= types, (
        f"events.event_type lost a cohort the theta_user_overlap row "
        f"names: {sorted(types)}"
    )
    overlap = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id")
        .intersect(
            ev.filter(F.col("event_type") == "purchase").select("user_id")
        )
        .count()
    )
    assert overlap > 0, "click/purchase cohorts no longer share any users"


def test_fixture_spans_support_probe_rows(spark):
    """Drift guards for rows whose non-vacuousness depends on fixture
    SHAPE, not schema: scd2_asof_lookup probes max(ts) - 7d (an events
    span under 7 days would silently return 0 rows on both engines —
    the exact vacuous-pass class the round-5 probe fix removed), and
    doc_chunking/fuzzy_name_blocked assume multi-chunk documents and
    multi-member name blocks."""
    ev = load_table(spark, SF_SMALL, "events")
    span = ev.agg(
        (F.unix_timestamp(F.max("ts").cast("timestamp"))
         - F.unix_timestamp(F.min("ts").cast("timestamp"))).alias("s")
    ).first()["s"]
    assert span >= 7 * 86400, (
        f"events span shrank to {span}s; scd2_asof_lookup's max-7d probe "
        "would land before every interval (vacuous 0-row pass)"
    )

    from nomba_data_pipeline_spark.plans.queries import CHUNK_STRIDE

    docs = load_table(spark, SF_SMALL, "documents")
    multi = docs.filter(
        F.size(F.split(F.trim("text"), r"\s+")) > CHUNK_STRIDE
    ).count()
    assert multi > 0, "no document yields more than one chunk"

    cust = load_table(spark, SF_SMALL, "customer")
    per_block = (
        cust.groupBy(F.expr("c_custkey div 100")).count().agg(F.max("count")).first()[0]
    )
    assert per_block >= 2, "fuzzy blocking key yields no multi-member blocks"

    langs = docs.groupBy("lang").count().agg(
        F.min("count").alias("lo"), F.max("count").alias("hi")
    ).first()
    assert langs["hi"] > langs["lo"], (
        "documents.lang became uniform; domain_temperature_sample's "
        "thresholds would all be 10000 and the filter never fires "
        "(vacuous full-table pass)"
    )

    nbins = (
        ev.select(F.least(F.lit(9), F.floor(F.col("value") / 50)).alias("b"))
        .distinct()
        .count()
    )
    assert nbins >= 5, (
        "events.value collapsed into few 50-wide bins; snapshot_drift_psi "
        "would compare near-degenerate histograms"
    )


def test_zero_completed_order_customers_exist():
    # customer_order_distribution's Q13 zero bucket: some customers must
    # have NO 'F'-status orders, or the LEFT join is indistinguishable
    # from an inner join and the row stops guarding the classic Q13 bug.
    # Checked at BOTH the unit (sf0.001) and driver-grading (sf0.01)
    # scales via duckdb — a fixture regeneration that de-vacuates only
    # one scale must fail loudly.
    import duckdb

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        con = duckdb.connect()
        n_zero = con.execute(
            f"""
            SELECT count(*) FROM '{sf_dir}/customer.parquet' c
            WHERE NOT EXISTS (
              SELECT 1 FROM '{sf_dir}/orders.parquet' o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
            """
        ).fetchone()[0]
        con.close()
        assert n_zero > 0, (
            f"{sf_dir}: every customer has a completed order; "
            "customer_order_distribution's zero bucket is vacuous and an "
            "inner-join regression would grade green"
        )
