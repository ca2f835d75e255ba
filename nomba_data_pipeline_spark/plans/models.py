"""Medallion model layer: staging -> dims -> facts, Spark-first.

The reference's domain (users / savings plans / savings transactions,
reference dbt_project/nomba_dbt/models/*) is instantiated on the
driver's testdata star schema with a documented mapping:

  users        <- customer   (key c_custkey)
  plans        <- orders     (key o_orderkey, owner o_custkey)
  transactions <- lineitem   (key (l_orderkey, l_linenumber))

Each model is a pure function (spark, sf_dir) -> DataFrame, mirroring a
dbt model's SELECT (SURVEY §3.2: "each model = a DataFrame fn in a
dependency-ordered registry"). Join strategy notes inline — dims are
small relative to facts, so we broadcast them explicitly where Catalyst
could not know the size statically (e.g. after transformations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from nomba_data_pipeline_spark.catalog import load_table
from nomba_data_pipeline_spark.functions.timeutil import month_start as to_month
from nomba_data_pipeline_spark.functions.timeutil import to_lagos


def stg_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 rename-projection (reference stg_users.sql:7-14)."""
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_name").alias("full_name"),
        F.col("c_nationkey").alias("nation_key"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_acctbal").alias("acct_balance"),
    )


def stg_plans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 staging projection with Lagos tz conversion
    (reference stg_savings_plan.sql:9-19)."""
    return load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("plan_id"),
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("product_type"),
        F.col("o_totalprice").alias("target_amount"),
        to_lagos("o_orderdate").alias("created_at_lagos"),
        F.col("o_orderdate").alias("updated_at"),
    )


def stg_transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 for the fact source (reference stg_savings_transaction.sql:11-20).

    Composite source key (l_orderkey, l_linenumber) becomes a single
    surrogate txn_id = orderkey*100 + linenumber (linenumber < 100),
    mirroring the reference's single-column `transaction_id`.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        (F.col("l_orderkey") * 100 + F.col("l_linenumber")).alias("transaction_id"),
        F.col("l_orderkey").alias("plan_id"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("amount"),
        F.col("l_quantity").alias("quantity"),
        F.col("l_returnflag").alias("return_flag"),
        F.col("l_linestatus").alias("line_status"),
        to_lagos("l_shipdate").alias("txn_ts_lagos"),
        F.col("l_shipdate").alias("updated_at"),
    )


def enrich_users_geo(users: DataFrame, spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attach nation/region names to a users-shaped frame (broadcast dims)."""
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nation_key"),
        F.col("n_name").alias("nation"),
        F.col("n_regionkey").alias("region_key"),
    )
    region = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("region_key"),
        F.col("r_name").alias("region"),
    )
    return (
        users.join(broadcast(nation), "nation_key", "left")
        .join(broadcast(region), "region_key", "left")
        .drop("region_key")
    )


def dim_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dim_users (reference dim_users.sql:1-15): current-state users with
    nation/region attributes. F1 concat shown via region-qualified name.
    In the full pipeline this reads current_rows(users_snapshot); as a
    stateless query it is stg_users enriched with geo dims (broadcast —
    nation:25 rows, region:5 rows)."""
    return enrich_users_geo(stg_users(spark, sf_dir), spark, sf_dir).select(
        "user_id",
        "full_name",
        F.concat_ws(" ", F.col("full_name"), F.col("nation")).alias("display_name"),
        "segment",
        "acct_balance",
        "nation",
        "region",
    )


def dim_plans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 left equi-join plans -> users (reference dim_savings_plan.sql:24-26).

    users is ~1/10th of plans; joined on user_id. At 100 TB the user dim
    may exceed broadcast size -> plain shuffled hash join on user_id is
    correct; here Catalyst/AQE picks broadcast automatically when small.
    """
    plans = stg_plans(spark, sf_dir)
    users = dim_users(spark, sf_dir).select("user_id", "segment", "nation", "region")
    return plans.join(users, "user_id", "left").select(
        "plan_id",
        "user_id",
        "status",
        "product_type",
        "target_amount",
        "updated_at",
        "segment",
        "nation",
        "region",
    )


def fact_transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 left equi-join txns -> plans (reference fact_savings_transaction.sql:21-23)."""
    txns = stg_transactions(spark, sf_dir)
    plans = dim_plans(spark, sf_dir).select(
        "plan_id", "user_id", "product_type", "segment", "nation", "region"
    )
    return txns.join(plans, "plan_id", "left").select(
        "transaction_id",
        "plan_id",
        "user_id",
        "amount",
        "quantity",
        "return_flag",
        "line_status",
        "updated_at",
        "product_type",
        "segment",
        "nation",
        "region",
    )
