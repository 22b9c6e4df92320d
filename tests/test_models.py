from __future__ import annotations

from decimal import Decimal

from pyspark.sql import Row

from olist_snowflake_dbt_spark.models.olist import register_olist_models
from olist_snowflake_dbt_spark.models.tpch import build_registry
from olist_snowflake_dbt_spark.plans import ModelRegistry


def test_tpch_fct_orders_smoke(spark, sf_dir):
    reg = build_registry(spark, sf_dir)
    df = reg.build("fct_orders")
    assert df.count() > 0
    cols = df.columns
    assert cols == [
        "order_id", "customer_id", "order_status", "purchased_at",
        "city", "state", "total_item_revenue", "total_shipping_revenue",
        "total_order_value",
    ]


def test_olist_models_on_fixtures(spark):
    reg = ModelRegistry(spark)
    orders_schema = (
        "order_id string, customer_id string, order_status string, "
        "order_purchase_timestamp timestamp, order_approved_at timestamp, "
        "order_delivered_carrier_date timestamp, "
        "order_delivered_customer_date timestamp, "
        "order_estimated_delivery_date timestamp"
    )
    import datetime as dt

    orders = spark.createDataFrame(
        [
            ("o1", "c1", "delivered", dt.datetime(2020, 1, 1), None, None, None, None),
            ("o2", "c2", "shipped", dt.datetime(2020, 1, 2), None, None, None, None),
        ],
        orders_schema,
    )
    customers = spark.createDataFrame(
        [Row(customer_id="c1", customer_unique_id="u1",
             customer_zip_code_prefix=1037, customer_city="sao paulo",
             customer_state="SP")]
    )
    items = spark.createDataFrame(
        [
            Row(order_id="o1", order_item_id=1, product_id="p1",
                price=Decimal("10.00"), freight_value=Decimal("2.50")),
            Row(order_id="o1", order_item_id=2, product_id="p2",
                price=Decimal("5.00"), freight_value=Decimal("1.00")),
        ]
    )
    reg.register_source("olist_orders_dataset", orders)
    reg.register_source("olist_customers_dataset", customers)
    reg.register_source("olist_order_items_dataset", items)
    register_olist_models(reg)

    fct = {r.order_id: r for r in reg.build("fct_orders").collect()}
    assert len(fct) == 2
    # o1: aggregated items + customer join hit
    assert fct["o1"].city == "sao paulo"
    assert fct["o1"].total_item_revenue == Decimal("15.00")
    assert fct["o1"].total_shipping_revenue == Decimal("3.50")
    assert fct["o1"].total_order_value == Decimal("18.50")
    # o2: LEFT JOIN misses → NULL city, NULL revenue, NULL arithmetic
    assert fct["o2"].city is None
    assert fct["o2"].total_item_revenue is None
    assert fct["o2"].total_order_value is None


def test_olist_dag_shape(spark):
    reg = ModelRegistry(spark)
    for s in ("olist_orders_dataset", "olist_customers_dataset",
              "olist_order_items_dataset"):
        reg.register_source(s, spark.range(1))
    register_olist_models(reg)
    order = reg.topological_order()
    assert order.index("stg_olist_orders") < order.index("fct_orders")
    assert reg.select("+fct_orders") == {
        "stg_olist_orders", "stg_olist_customers", "stg_items", "fct_orders"}
