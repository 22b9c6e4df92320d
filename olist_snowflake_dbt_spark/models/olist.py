"""The reference's four models, re-expressed as Spark SQL registry models.

Semantics (not text) ported from:
- models/staging/stg_olist_orders.sql:1-14    (projection + 5 renames)
- models/staging/stg_olist_customers.sql:1-10 (projection + 3 renames)
- models/staging/stg_items.sql:1-10           (projection + 1 rename)
- models/marts/fct_orders.sql:1-30            (CTEs, pre-agg GROUP BY+SUM,
  GROUP BY ordinal, 2x LEFT JOIN, NULL-propagating arithmetic)

Staging is ``view`` (dbt default — artifacts/resources/v1/config.py:81),
the mart is ``table`` (dbt_project.yml:35-36). Spark SQL accepts these
SELECT bodies unchanged modulo the ref() placeholders, which the registry
resolves to temp views; Catalyst then fuses all three staging views into
the fact CTAS — the same end-to-end optimization Snowflake performs on
inlined views (SURVEY.md §4).

Scale notes (100 TB): the items pre-aggregation reduces N:1 cardinality
*before* the join (authored in the reference, kept — it is the grain
definition); the orders⋈customers join keys are both high-cardinality so
AQE picks shuffle vs broadcast from runtime stats; all three joins/aggs
key on uniformly-distributed ids (no skew salting needed).
"""

from __future__ import annotations

from ..plans.registry import ModelRegistry

STG_OLIST_ORDERS = """
with raw_orders as (
    select * from {{ ref('olist_orders_dataset') }}
)
select
    order_id,
    customer_id,
    order_status,
    order_purchase_timestamp as purchased_at,
    order_approved_at as approved_at,
    order_delivered_carrier_date as delivered_to_carrier_at,
    order_delivered_customer_date as delivered_to_customer_at,
    order_estimated_delivery_date as estimated_delivery_at
from raw_orders
"""

STG_OLIST_CUSTOMERS = """
with raw_customers as (
    select * from {{ ref('olist_customers_dataset') }}
)
select
    customer_id,
    customer_unique_id,
    customer_zip_code_prefix as zip_code,
    customer_city as city,
    customer_state as state
from raw_customers
"""

STG_ITEMS = """
with raw_order_items as (
    select * from {{ ref('olist_order_items_dataset') }}
)
select
    order_id,
    order_item_id,
    product_id,
    price,
    freight_value as shipping_cost
from raw_order_items
"""

FCT_ORDERS = """
with orders as (
    select * from {{ ref('stg_olist_orders') }}
),
customers as (
    select * from {{ ref('stg_olist_customers') }}
),
order_items as (
    select
        order_id,
        sum(price) as total_item_revenue,
        sum(shipping_cost) as total_shipping_revenue
    from {{ ref('stg_items') }}
    group by 1
)
select
    o.order_id,
    o.customer_id,
    o.order_status,
    o.purchased_at,
    c.city,
    c.state,
    i.total_item_revenue,
    i.total_shipping_revenue,
    (i.total_item_revenue + i.total_shipping_revenue) as total_order_value
from orders o
left join customers c on o.customer_id = c.customer_id
left join order_items i on o.order_id = i.order_id
"""


def register_olist_models(registry: ModelRegistry) -> None:
    """Register the pipeline; Bronze sources (``olist_*_dataset``) must be
    provided via ``registry.register_source`` (seed parquet or fixtures)."""
    registry.register("stg_olist_orders", STG_OLIST_ORDERS, materialized="view")
    registry.register("stg_olist_customers", STG_OLIST_CUSTOMERS, materialized="view")
    registry.register("stg_items", STG_ITEMS, materialized="view")
    registry.register("fct_orders", FCT_ORDERS, materialized="table")
