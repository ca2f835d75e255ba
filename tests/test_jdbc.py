"""JDBC source option construction (S2) — the reader itself needs a live
database + driver jar (absent here by design), but the partitioned-read
options and incremental predicate logic are pure and testable."""

from __future__ import annotations

from nomba_data_pipeline_spark.sources.jdbc import JdbcSource


def test_reader_options_partitioned():
    src = JdbcSource(
        url="jdbc:postgresql://db:5432/app",
        table="public.savings_transactions",
        user="u",
        password="p",
        partition_column="txn_id",
        num_partitions=16,
        fetch_size=10000,
    )
    opts = src.reader_options(lower="0", upper="3000000")
    assert opts["partitionColumn"] == "txn_id"
    assert opts["numPartitions"] == "16"
    assert opts["lowerBound"] == "0" and opts["upperBound"] == "3000000"
    assert opts["fetchsize"] == "10000"


def test_reader_options_unpartitioned_when_bounds_missing():
    src = JdbcSource(url="jdbc:postgresql://db/app", table="t", user="u", password="p")
    opts = src.reader_options()
    assert "partitionColumn" not in opts
    assert opts["dbtable"] == "t"
