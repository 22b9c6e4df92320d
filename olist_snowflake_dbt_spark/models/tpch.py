"""TPC-H-testdata analogue of the reference pipeline (driver harness models).

Maps the Olist star schema onto the driver's tables per FIXTURES.md:
orders→orders, lineitem→order items, customer→customers. The operator
shapes are the reference's (projection/rename, pre-agg GROUP BY+SUM, two
LEFT JOINs, NULL-propagating arithmetic — SURVEY.md §2 A3-A9).

Money math is routed through DecimalType: the testdata ships doubles, but
double summation is order-dependent (Spark's partial aggregation vs the
DuckDB oracle's scan order would drift in the last ulp). Casting each
item amount to decimal(18,2) FIRST makes the sums exact and
order-independent — both engines then agree bit-for-bit. Same policy the
reference gets from Snowflake NUMBER columns (SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.registry import ModelContext, ModelRegistry
from ..sources.readers import read_table


def stg_orders(ctx: ModelContext) -> DataFrame:
    return ctx.source("orders").select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_custkey").alias("customer_id"),
        F.col("o_orderstatus").alias("order_status"),
        F.col("o_orderdate").alias("purchased_at"),
    )


def stg_customers(ctx: ModelContext) -> DataFrame:
    return ctx.source("customer").select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_name").alias("customer_unique_id"),
        F.col("c_mktsegment").alias("city"),
        F.col("c_nationkey").cast("string").alias("state"),
    )


def stg_items(ctx: ModelContext) -> DataFrame:
    """Lineitem as order items; extendedprice ≈ price, price*tax ≈ freight."""
    li = ctx.source("lineitem")
    return li.select(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_linenumber").alias("order_item_id"),
        F.col("l_partkey").alias("product_id"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("price"),
        # decimal*decimal (exact) — a double multiply then cast would round
        # differently from the DuckDB oracle at .005 boundaries
        (F.col("l_extendedprice").cast("decimal(18,2)") * F.col("l_tax").cast("decimal(8,2)"))
        .cast("decimal(18,4)")
        .alias("shipping_cost"),
    )


def fct_orders(ctx: ModelContext) -> DataFrame:
    orders = ctx.ref("stg_orders")
    customers = ctx.ref("stg_customers")
    items = (
        ctx.ref("stg_items")
        .groupBy("order_id")
        .agg(
            F.sum("price").cast("decimal(38,2)").alias("total_item_revenue"),
            F.sum("shipping_cost").cast("decimal(38,4)").alias("total_shipping_revenue"),
        )
    )
    return (
        orders.join(customers, "customer_id", "left")
        .join(items, "order_id", "left")
        .select(
            "order_id",
            "customer_id",
            "order_status",
            "purchased_at",
            "city",
            "state",
            "total_item_revenue",
            "total_shipping_revenue",
            (F.col("total_item_revenue") + F.col("total_shipping_revenue"))
            .cast("decimal(38,4)")
            .alias("total_order_value"),
        )
    )


def build_registry(spark, sf_dir: str) -> ModelRegistry:
    """Registry with testdata sources + the analogue pipeline registered."""
    registry = ModelRegistry(spark)
    for t in ("orders", "customer", "lineitem", "nation", "region", "supplier", "part"):
        registry.register_source(t, lambda s, _t=t: read_table(s, sf_dir, _t))
    registry.register("stg_orders", stg_orders, materialized="view")
    registry.register("stg_customers", stg_customers, materialized="view",
                      depends_on=())
    registry.register("stg_items", stg_items, materialized="view")
    registry.register(
        "fct_orders", fct_orders, materialized="table",
        depends_on=("stg_orders", "stg_customers", "stg_items"),
    )
    return registry
