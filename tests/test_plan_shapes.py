"""Physical-plan regression guards: the optimizations we designed for
must actually appear in the plan (broadcasts, pushdown, pruning).
A correctness-green change that silently loses a broadcast or a pushed
filter is a 100x regression at scale — these tests catch it."""

from __future__ import annotations

from pyspark.sql import functions as F

from nomba_data_pipeline_spark.catalog import load_table
from nomba_data_pipeline_spark.plans.queries import REGISTRY
from tests.conftest import SF_SMALL


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_flagship_broadcasts_geo_dims(spark):
    plan = _plan(REGISTRY["flagship_revenue_by_region"].fn(spark, SF_SMALL))
    # nation + region joins must be broadcast, never shuffled
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_filter_pushdown_reaches_scan(spark):
    df = load_table(spark, SF_SMALL, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,F)]" in plan


def test_column_pruning_reaches_scan(spark):
    df = load_table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_quantity")
    plan = _plan(df)
    # ReadSchema must carry only the projected columns
    read_schema_lines = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema_lines, plan
    assert "l_extendedprice" not in read_schema_lines[0]
    assert "l_orderkey" in read_schema_lines[0]


def test_asof_join_is_single_shuffle(spark):
    plan = _plan(REGISTRY["asof_join"].fn(spark, SF_SMALL))
    # union trick: no join operator at all, one window after one exchange
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert "Window" in plan


def test_range_join_is_equi_join(spark):
    plan = _plan(REGISTRY["range_join_count"].fn(spark, SF_SMALL))
    # bucketing must turn the interval predicate into a real equi-join:
    # no broadcast nested loop / cartesian anywhere
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
