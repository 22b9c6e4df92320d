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
       CAST(i.total_item_revenue AS DOUBLE) AS total_item_revenue,
       CAST(i.total_shipping_revenue AS DOUBLE) AS total_shipping_revenue,
       CAST(CAST(i.total_item_revenue + i.total_shipping_revenue AS DECIMAL(38,4))
            AS DOUBLE) AS total_order_value
FROM stg_orders o
LEFT JOIN stg_customers c ON o.customer_id = c.customer_id
LEFT JOIN order_items i ON o.order_id = i.order_id
"""


@query("fct_orders", _FCT_ORDERS_ORACLE)
def q_fct_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the full reference pipeline (CTEs, projection/rename,
    pre-agg GROUP BY+SUM, 2x LEFT JOIN, NULL arithmetic — A2-A9).

    Money math stays DECIMAL inside the model (exact, order-independent);
    the presentation layer casts to DOUBLE so both engines render the
    same float64 through pandas (DuckDB collapses DECIMAL trailing zeros
    there, Spark keeps Decimal — value-equal yet repr-divergent)."""
    from .models.tpch import build_registry

    fct = build_registry(spark, sf_dir).build("fct_orders")
    return fct.select(
        *[
            F.col(c).cast("double").alias(c)
            if c in ("total_item_revenue", "total_shipping_revenue", "total_order_value")
            else c
            for c in fct.columns
        ]
    )


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
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price
    FROM orders WHERE o_totalprice < 10000
    """,
)
def q_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: WHERE predicate; pushed to the parquet scan by Catalyst."""
    o = _t(spark, sf_dir, "orders")
    return o.filter(F.col("o_totalprice") < 10000).select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("total_price"),
    )


@query(
    "groupby_sum_ordinal",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2))
                AS DOUBLE) AS sum_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
                AS DOUBLE) AS sum_price,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY 1, 2
    """,
)
def q_groupby_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/A7: hash aggregate with SUMs (Spark: partial map-side agg, then
    one shuffle on the group keys — scales linearly at 100 TB).
    Sums accumulate in DECIMAL (exact under any reduce order), final
    presentation cast to DOUBLE for driver repr parity."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .cast("double")
        .alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .cast("double")
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
           CAST(CAST(i.rev + CAST(o.o_totalprice AS DECIMAL(18,2)) AS DECIMAL(38,2))
                AS DOUBLE) AS combined_value
    FROM orders o LEFT JOIN items i ON o.o_orderkey = i.l_orderkey
    """,
)
def q_null_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: + propagates NULL (the 257 lineitem-less orders at sf0.01).
    Final DOUBLE cast: NULL → NaN identically through pandas on both
    engines (Spark Decimal None vs DuckDB float NaN would diverge)."""
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
        .cast("double")
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
    SELECT order_id, CAST(total_order_value AS DOUBLE) AS total_order_value
    FROM fct WHERE total_order_value < 0
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
    return fct.filter(F.col("total_order_value") < 0).withColumn(
        "total_order_value", F.col("total_order_value").cast("double")
    )


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


# =====================================================================
# Relational breadth beyond the reference surface (SURVEY.md §2.C):
# windows, top-k, set ops, dates, JSON, rollup, pivot, sessionization,
# as-of joins. The reference has none of these; they complete the
# capability envelope a warehouse user expects.
# =====================================================================


@query(
    "window_running_agg",
    """
    SELECT l_orderkey AS order_id, l_linenumber AS line_no,
           ROW_NUMBER() OVER w AS rn,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) OVER
                (PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_extendedprice, l_partkey, l_suppkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DECIMAL(38,2)) AS DOUBLE) AS running_price,
           LAG(l_linenumber) OVER w AS prev_line
    FROM lineitem
    WINDOW w AS (PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_extendedprice, l_partkey, l_suppkey)
    """,
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window functions: row_number, running sum, lag. One shuffle on the
    partition key; rows never leave their partition after that.
    (l_orderkey, l_linenumber) is NOT unique in the testdata, so the
    window order carries tie-breakers — a deterministic total order is
    what makes running aggregates reproducible across engines."""
    li = _t(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_extendedprice", "l_partkey", "l_suppkey")
    return li.select(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_linenumber").alias("line_no"),
        F.row_number().over(w).alias("rn"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("decimal(38,2)")
        .cast("double")
        .alias("running_price"),
        F.lag("l_linenumber").over(w).alias("prev_line"),
    )


@query(
    "topk_per_group",
    """
    SELECT * FROM (
        SELECT l_returnflag,
               l_orderkey AS order_id, l_linenumber AS line_no,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
               ROW_NUMBER() OVER (
                   PARTITION BY l_returnflag
                   ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
               ) AS rnk
        FROM lineitem
    ) WHERE rnk <= 5
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group with a total order (ties broken by key) so the
    result is deterministic. At scale: the window shuffles once by group;
    no global sort, no driver collect."""
    li = _t(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_returnflag").orderBy(
        F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
    )
    return (
        li.select(
            "l_returnflag",
            F.col("l_orderkey").alias("order_id"),
            F.col("l_linenumber").alias("line_no"),
            F.col("l_extendedprice").cast("decimal(18,2)").cast("double").alias("price"),
            F.row_number().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= 5)
    )


@query(
    "distinct_agg",
    """
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — Spark expands to a two-phase partial-distinct
    aggregate; no driver-side dedup."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "set_ops",
    """
    WITH big AS (SELECT o_custkey AS customer_id FROM orders
                 WHERE o_totalprice > 200000),
         recent AS (SELECT o_custkey AS customer_id FROM orders
                    WHERE o_orderdate >= TIMESTAMP '2000-01-01')
    SELECT customer_id, 'both' AS bucket
      FROM (SELECT * FROM big INTERSECT SELECT * FROM recent)
    UNION ALL
    SELECT customer_id, 'big_only' AS bucket
      FROM (SELECT * FROM big EXCEPT SELECT * FROM recent)
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL composition."""
    o = _t(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 200000).select(
        F.col("o_custkey").alias("customer_id"))
    recent = o.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")).select(
        F.col("o_custkey").alias("customer_id"))
    both = big.intersect(recent).withColumn("bucket", F.lit("both"))
    # EXCEPT is set semantics (like the SQL oracle) — subtract, not exceptAll
    big_only = big.distinct().subtract(recent).withColumn("bucket", F.lit("big_only"))
    return both.unionByName(big_only)


@query(
    "semi_join_exists",
    """
    SELECT c_custkey AS customer_id, c_mktsegment AS segment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join = EXISTS; no duplication of the left side."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_mktsegment").alias("segment"),
    )


@query(
    "scalar_functions",
    """
    SELECT c_custkey AS customer_id,
           UPPER(c_name) AS name_upper,
           SUBSTRING(c_name, 1, 8) AS name_prefix,
           LENGTH(c_name) AS name_len,
           c_name LIKE '%5' AS ends_in_5,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS bal_bucket,
           CAST(CAST(ROUND(CAST(c_acctbal AS DECIMAL(18,2)) / 100, 1) AS DECIMAL(18,1))
                AS DOUBLE) AS bal_hundreds
    FROM customer
    """,
)
def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/conditional/math scalar functions — all JVM-side codegen."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("customer_id"),
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.col("c_name").like("%5").alias("ends_in_5"),
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_bucket"),
        F.round(F.col("c_acctbal").cast("decimal(18,2)") / 100, 1)
        .cast("decimal(18,1)")
        .cast("double")
        .alias("bal_hundreds"),
    )


@query(
    "date_functions",
    """
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
           CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS order_month,
           COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
                AS DOUBLE) AS revenue
    FROM orders
    GROUP BY 1, 2
    """,
)
def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar rollup on extracted date parts."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy(
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.month("o_orderdate").cast("bigint").alias("order_month"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .cast("double")
        .alias("revenue"),
    )


@query(
    "json_extract",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
    FROM events
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access: JSON path extraction from a string column."""
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_value"),
    )


@query(
    "time_bucket_agg",
    """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2))
                AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def q_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (batch twin of the streaming windowed
    agg in streaming/events.py — same grouping, same results)."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy(
        F.window("ts", "1 hour")["start"].alias("window_start"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .cast("double")
        .alias("total_value"),
    )


@query(
    "grouping_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) AS g_flag, GROUPING(l_linestatus) AS g_status,
           COUNT(*) AS n_rows,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2))
                AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP with GROUPING indicators (subtotal rows)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("bigint").alias("g_flag"),
        F.grouping("l_linestatus").cast("bigint").alias("g_status"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .cast("double")
        .alias("sum_qty"),
    ).select(
        "l_returnflag", "l_linestatus", "g_flag", "g_status", "n_rows", "sum_qty"
    )


@query(
    "pivot_status_by_year",
    """
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_partial
    FROM orders GROUP BY 1
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide conditional aggregation) over a fixed value list —
    fixed values keep it one pass, no driver-side distinct-collect."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.year("o_orderdate").cast("bigint").alias("order_year"))
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "order_year",
            F.coalesce("O", F.lit(0)).alias("n_open"),
            F.coalesce("F", F.lit(0)).alias("n_filled"),
            F.coalesce("P", F.lit(0)).alias("n_partial"),
        )
    )


@query(
    "sessionize_events",
    """
    WITH marked AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - LAG(ts) OVER w <= INTERVAL '30 minutes'
                    THEN 0 ELSE 1 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts, event_id,
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                           ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS session_no
        FROM marked
    )
    SELECT user_id, session_no, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM numbered GROUP BY user_id, session_no
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: lag + cumulative sum of session-break
    flags, then per-session aggregation. The batch twin of streaming
    session_window; one shuffle on user_id, order within partition."""
    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # interval comparison works for both TIMESTAMP and TIMESTAMP_NTZ inputs
    # (unix_micros rejects NTZ, and parquet timestamps without tz metadata
    # read as NTZ under Spark 4's inferTimestampNTZ default)
    gap = F.col("ts") - F.lag(F.col("ts")).over(w)
    marked = e.select(
        "user_id", "ts", "event_id",
        F.when(gap <= F.expr("INTERVAL 30 MINUTES"), 0).otherwise(1).alias("new_session"),
    )
    numbered = marked.withColumn(
        "session_no",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return numbered.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@query(
    "asof_last_purchase",
    """
    SELECT event_id, user_id, ts, event_type,
           LAST_VALUE(CASE WHEN event_type = 'purchase' THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS last_purchase_ts
    FROM events
    """,
)
def q_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (self): for every event, the most recent purchase at or
    before it — last_value(...ignore nulls) over an ordered window. The
    pattern Spark lacks as a native operator, composed from built-ins
    (option (a) of the custom-operator ladder)."""
    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow)
    return e.select(
        "event_id", "user_id", "ts", "event_type",
        F.last(
            F.when(F.col("event_type") == "purchase", F.col("ts")), ignorenulls=True
        ).over(w).alias("last_purchase_ts"),
    )


@query(
    "incremental_merge_sim",
    """
    WITH existing AS (
        SELECT user_id, event_id, ts, value FROM events
        WHERE ts < TIMESTAMP '2024-06-01'
        QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    ),
    batch AS (
        SELECT user_id, event_id, ts, value FROM events
        WHERE ts >= TIMESTAMP '2024-06-01'
        QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    )
    SELECT * FROM existing WHERE user_id NOT IN (SELECT user_id FROM batch)
    UNION ALL
    SELECT * FROM batch
    """,
)
def q_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1 merge strategy exercised as a batch query: latest-state table
    upserted with a newer batch via the engine's incremental_merge
    (anti-join + union)."""
    from .operators.incremental import incremental_merge

    e = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    cutoff = F.lit("2024-06-01").cast("timestamp")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())

    def latest(df: DataFrame) -> DataFrame:
        return df.withColumn("__rn", F.row_number().over(w)).filter("__rn = 1").drop("__rn")

    existing = latest(e.filter(F.col("ts") < cutoff))
    batch = latest(e.filter(F.col("ts") >= cutoff))
    return incremental_merge(existing, batch, ["user_id"])


@query(
    "scd2_window_rebuild",
    """
    SELECT user_id, value AS state_value, ts AS dbt_valid_from,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS dbt_valid_to
    FROM events WHERE event_type = 'signup'
    """,
)
def q_scd2_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 SCD-2 expressed as a change-log rebuild: each change row is
    valid until the next change for the same key (lead over window) —
    the batch-SQL twin of operators/snapshots.py."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_type") == "signup")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        F.col("value").alias("state_value"),
        F.col("ts").alias("dbt_valid_from"),
        F.lead("ts").over(w).alias("dbt_valid_to"),
    )


# extension queries (dedup / similarity / text, streaming) register on import
from . import queries_ext  # noqa: E402,F401
from . import queries_streaming  # noqa: E402,F401
from . import queries_multimodal  # noqa: E402,F401
from . import queries_sql_breadth  # noqa: E402,F401
from . import queries_formats  # noqa: E402,F401
from . import queries_sampling  # noqa: E402,F401
from . import queries_udfs  # noqa: E402,F401
from . import queries_materialize  # noqa: E402,F401
from . import queries_tpch  # noqa: E402,F401
from . import queries_runner  # noqa: E402,F401
from . import queries_timetravel  # noqa: E402,F401
from . import queries_governance  # noqa: E402,F401
from . import queries_retrieval  # noqa: E402,F401
from . import queries_migration  # noqa: E402,F401
from . import queries_web  # noqa: E402,F401
from . import queries_timeseries  # noqa: E402,F401
from . import queries_tokenizer  # noqa: E402,F401
from . import queries_geo  # noqa: E402,F401
from . import queries_sequence  # noqa: E402,F401
