"""Driver-facing query registry: name → (Spark callable, DuckDB oracle SQL).

Each entry demonstrates one operator row from SURVEY.md §2 (or an
extension) over the driver's TPC-H-ish testdata. Registration is via the
``@query`` decorator; ``__spark_entry__.py`` re-exports ``QUERIES`` /
``ORACLE_SQL``.

Determinism rules (see SURVEY.md §7 risk register):
- Money/sum math goes through DECIMAL on both sides — exact and
  order-independent, so the order-insensitive value hash matches.
- Every computed column is aliased identically in Spark and SQL.
- No LIMIT without a total order; top-k uses rank over a unique ordering.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from .sources.readers import read_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a driver query; ``oracle=None`` ⇒ rows-only check."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# =====================================================================
# Reference surface (SURVEY.md §2.A) — the fct_orders pipeline + parts
# =====================================================================

_FCT_ORDERS_ORACLE = """
WITH stg_orders AS (
    SELECT o_orderkey AS order_id, o_custkey AS customer_id,
           o_orderstatus AS order_status, o_orderdate AS purchased_at
    FROM orders
),
stg_customers AS (
    SELECT c_custkey AS customer_id, c_name AS customer_unique_id,
           c_mktsegment AS city, CAST(c_nationkey AS VARCHAR) AS state
    FROM customer
),
stg_items AS (
    SELECT l_orderkey AS order_id,
           CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_tax AS DECIMAL(8,2))
                AS DECIMAL(18,4)) AS shipping_cost
    FROM lineitem
),
order_items AS (
    SELECT order_id,
           CAST(SUM(price) AS DECIMAL(38,2)) AS total_item_revenue,
           CAST(SUM(shipping_cost) AS DECIMAL(38,4)) AS total_shipping_revenue
    FROM stg_items
    GROUP BY 1
)
SELECT o.order_id, o.customer_id, o.order_status, o.purchased_at,
       c.city, c.state,
       i.total_item_revenue, i.total_shipping_revenue,
       CAST(i.total_item_revenue + i.total_shipping_revenue AS DECIMAL(38,4))
           AS total_order_value
FROM stg_orders o
LEFT JOIN stg_customers c ON o.customer_id = c.customer_id
LEFT JOIN order_items i ON o.order_id = i.order_id
"""


@query("fct_orders", _FCT_ORDERS_ORACLE)
def q_fct_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the full reference pipeline (CTEs, projection/rename,
    pre-agg GROUP BY+SUM, 2x LEFT JOIN, NULL arithmetic — A2-A9)."""
    from .models.tpch import build_registry

    return build_registry(spark, sf_dir).build("fct_orders")


@query(
    "stg_projection_rename",
    """
    SELECT o_orderkey AS order_id, o_custkey AS customer_id,
           o_orderstatus AS order_status, o_orderdate AS purchased_at
    FROM orders
    """,
)
def q_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/A4/A5: projection + rename (stg_olist_orders.sql:5-14 shape)."""
    return _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_custkey").alias("customer_id"),
        F.col("o_orderstatus").alias("order_status"),
        F.col("o_orderdate").alias("purchased_at"),
    )


@query(
    "filter_predicate",
    """
    SELECT o_orderkey AS order_id,
           CAST(o_totalprice AS DECIMAL(18,2)) AS total_price
    FROM orders WHERE o_totalprice < 10000
    """,
)
def q_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: WHERE predicate; pushed to the parquet scan by Catalyst."""
    o = _t(spark, sf_dir, "orders")
    return o.filter(F.col("o_totalprice") < 10000).select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("total_price"),
    )


@query(
    "groupby_sum_ordinal",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_price,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY 1, 2
    """,
)
def q_groupby_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/A7: hash aggregate with SUMs (Spark: partial map-side agg, then
    one shuffle on the group keys — scales linearly at 100 TB)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("decimal(38,2)").alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .alias("sum_price"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "left_join_null_fill",
    """
    SELECT o.o_orderkey AS order_id, o.o_custkey AS customer_id,
           c.c_mktsegment AS city, c.c_acctbal AS acctbal
    FROM orders o
    LEFT JOIN (SELECT * FROM customer WHERE c_acctbal >= 0) c
      ON o.o_custkey = c.c_custkey
    """,
)
def q_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: LEFT OUTER equi-join preserving all left rows with NULL fill
    (misses forced via the acctbal filter)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") >= 0)
    return o.join(c, o.o_custkey == c.c_custkey, "left").select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_custkey").alias("customer_id"),
        F.col("c_mktsegment").alias("city"),
        F.col("c_acctbal").alias("acctbal"),
    )


@query(
    "null_arithmetic",
    """
    WITH items AS (
        SELECT l_orderkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS rev
        FROM lineitem GROUP BY 1
    )
    SELECT o.o_orderkey AS order_id,
           CAST(i.rev + CAST(o.o_totalprice AS DECIMAL(18,2)) AS DECIMAL(38,2))
               AS combined_value
    FROM orders o LEFT JOIN items i ON o.o_orderkey = i.l_orderkey
    """,
)
def q_null_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: + propagates NULL (the 257 lineitem-less orders at sf0.01)."""
    o = _t(spark, sf_dir, "orders")
    items = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("decimal(38,2)").alias("rev"))
    )
    return o.join(items, o.o_orderkey == items.l_orderkey, "left").select(
        F.col("o_orderkey").alias("order_id"),
        (F.col("rev") + F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .alias("combined_value"),
    )


# ---------------------------------------------------------------------
# Data-quality test operators (A11-A15) expressed as failing-row queries
# ---------------------------------------------------------------------


@query(
    "dq_unique",
    """
    SELECT l_orderkey AS unique_field, COUNT(*) AS n_records
    FROM lineitem WHERE l_orderkey IS NOT NULL
    GROUP BY l_orderkey HAVING COUNT(*) > 1
    """,
)
def q_dq_unique(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 unique test (macros/generic_test_sql/unique.sql:1-13): failing
    rows = non-null values occurring more than once."""
    from .operators.dq import unique_failures

    return unique_failures(_t(spark, sf_dir, "lineitem"), "l_orderkey")


@query(
    "dq_not_null",
    """
    SELECT o.o_orderkey AS order_id, c.c_mktsegment AS city
    FROM orders o
    LEFT JOIN (SELECT * FROM customer WHERE c_acctbal >= 0) c
      ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment IS NULL
    """,
)
def q_dq_not_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 not_null test (generic_test_sql/not_null.sql:1-9) over a frame
    with real NULLs (join misses)."""
    from .operators.dq import not_null_failures

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") >= 0)
    joined = o.join(c, o.o_custkey == c.c_custkey, "left").select(
        F.col("o_orderkey").alias("order_id"), F.col("c_mktsegment").alias("city")
    )
    return not_null_failures(joined, "city", keep=("order_id", "city"))


@query(
    "dq_relationships",
    """
    SELECT o.o_orderkey AS order_id, o.o_custkey AS customer_id
    FROM orders o
    WHERE o.o_custkey IS NOT NULL
      AND NOT EXISTS (
        SELECT 1 FROM customer c
        WHERE c.c_acctbal >= 0 AND c.c_custkey = o.o_custkey)
    """,
)
def q_dq_relationships(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13 relationships test = LEFT ANTI join on non-null FKs
    (generic_test_sql/relationships.sql:1-23)."""
    from .operators.dq import relationship_failures

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_id"), F.col("o_custkey").alias("customer_id")
    )
    parent = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") >= 0)
        .select(F.col("c_custkey").alias("customer_id"))
    )
    return relationship_failures(o, "customer_id", parent, "customer_id")


@query(
    "dq_accepted_values",
    """
    SELECT o_orderstatus AS value_field, COUNT(*) AS n_records
    FROM orders GROUP BY o_orderstatus
    HAVING o_orderstatus NOT IN ('O', 'F')
    """,
)
def q_dq_accepted_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14 accepted_values test (generic_test_sql/accepted_values.sql:1-30)."""
    from .operators.dq import accepted_values_failures

    return accepted_values_failures(_t(spark, sf_dir, "orders"), "o_orderstatus", ["O", "F"])


@query(
    "dq_singular_revenue_positive",
    """
    WITH fct AS (
        SELECT l_orderkey AS order_id,
               CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                             * CAST(1 - 2 * l_discount AS DECIMAL(8,2))
                             AS DECIMAL(18,4)))
                    AS DECIMAL(38,4)) AS total_order_value
        FROM lineitem GROUP BY 1
    )
    SELECT order_id, total_order_value FROM fct WHERE total_order_value < 0
    """,
)
def q_dq_singular(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10+A15: the reference's singular test
    (tests/assert_revenue_is_positive.sql:3-7) — failing rows where a
    computed revenue goes negative (discount doubled to make some)."""
    li = _t(spark, sf_dir, "lineitem")
    fct = li.groupBy(F.col("l_orderkey").alias("order_id")).agg(
        F.sum(
            (
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (1 - 2 * F.col("l_discount")).cast("decimal(8,2)")
            ).cast("decimal(18,4)")
        )
        .cast("decimal(38,4)")
        .alias("total_order_value")
    )
    return fct.filter(F.col("total_order_value") < 0)


@query(
    "dq_verdict",
    """
    WITH failures AS (
        SELECT o_orderstatus FROM orders WHERE o_orderstatus NOT IN ('O', 'F')
    )
    SELECT COUNT(*) AS failures,
           COUNT(*) != 0 AS should_warn,
           COUNT(*) != 0 AS should_error
    FROM failures
    """,
)
def q_dq_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15 verdict wrapper (materializations/tests/helpers.sql:5-13):
    failures count + warn/error booleans in one row."""
    from .operators.dq import verdict_frame

    fails = _t(spark, sf_dir, "orders").filter(~F.col("o_orderstatus").isin("O", "F"))
    return verdict_frame(fails)
