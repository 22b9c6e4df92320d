"""TPC-H-style multi-way join analytics over the driver's testdata.

The reference project's single fact build (fct_orders,
/root/reference/models/marts/fct_orders.sql) is a 2-join star query;
these entries prove the engine's join *planning* surface at the shapes
TPC-H made canonical: selective-dimension star joins (Q3) and a 6-table
snowflake chain (Q5). Both are pure declarative DataFrame plans —
Catalyst broadcast-joins every dimension side (region/nation/customer
fit in memory at any scale factor; verify with .explain →
BroadcastHashJoin) and AQE re-plans the probe side at runtime, which is
exactly the strategy you want against 100 TB of lineitem: no shuffle of
the fact table for dimension joins, one shuffle for the aggregate.

Revenue math routes through DECIMAL on both engines (sum of
l_extendedprice*(1-l_discount) in double drifts in the last ulp between
engines); the presentation cast to DOUBLE is the engine's standard
driver-parity pattern (see queries.py header).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from .queries import _t, query

# revenue term shared by both engines: exact decimal per-row product,
# decimal sum, double presentation
_REV_SQL = (
    "CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(38,4)))"
    " AS DECIMAL(38,4)) AS DOUBLE)"
)


def _rev_col():
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        F.sum((price * (F.lit(1) - disc)).cast("decimal(38,4)"))
        .cast("decimal(38,4)")
        .cast("double")
    )


@query(
    "tpch_q3_priority_revenue",
    f"""
    SELECT l_orderkey, revenue, o_orderdate, o_orderpriority
    FROM (
        SELECT l.l_orderkey,
               {_REV_SQL} AS revenue,
               o.o_orderdate, o.o_orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
          AND l.l_shipdate > TIMESTAMP '1998-01-01'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    )
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping-priority revenue): selective dimension
    filter → star join → per-order revenue → global top-10. The
    customer side is filtered to ~1/5 before the join and broadcast;
    the top-10 is a sort-limit Catalyst executes as TakeOrderedAndProject
    (no full sort shuffle — each partition keeps 10 rows, the driver
    merges). o_orderpriority stands in for the spec's o_shippriority
    (not present in the driver's schema)."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_rev_col().alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "tpch_q5_region_volume",
    f"""
    SELECT n.n_name, {_REV_SQL} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local-supplier volume): a 6-table snowflake join with a
    non-key equi-condition (customer and supplier must share a nation).
    region→nation collapses to a broadcast filter before it ever
    touches the fact table; supplier and customer broadcast; lineitem
    — the 100 TB side — is never shuffled for any join, only for the
    final 25-group aggregate (map-side partial first)."""
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey", "n_name")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(
            F.broadcast(c),
            (o.o_custkey == c.c_custkey)
            & (s.s_nationkey == c.c_nationkey),
        )
        .groupBy("n_name")
        .agg(_rev_col().alias("revenue"))
    )


@query(
    "asof_click_attribution",
    """
    WITH purchases AS (
        SELECT event_id AS purchase_id, user_id, ts
        FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
        SELECT user_id, ts AS click_ts, MAX(event_id) AS click_id
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, ts
    )
    SELECT p.purchase_id, p.user_id, p.ts, c.click_id, c.click_ts
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.click_ts
    """,
)
def q_asof_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True two-table AS-OF join (last-touch attribution): every
    purchase event matched to the same user's most recent click at or
    before it. Spark lacks a native as-of operator; the composition is
    the union-then-window plan — tag both sides, one window per user
    ordered by (ts, side) carrying the last non-null click forward —
    which costs ONE shuffle on user_id, versus the naive range-join
    (purchases × all earlier clicks, then argmax) that explodes
    quadratically on hot users. Clicks are pre-reduced to one row per
    (user, ts) (max event_id) so same-timestamp ties are deterministic;
    ordering clicks before purchases at equal ts matches ASOF's >=.
    The oracle is DuckDB's native ASOF LEFT JOIN."""
    ev = _t(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.col("ts").alias("click_ts"))
        .agg(F.max("event_id").alias("click_id"))
        .select(
            "user_id",
            F.col("click_ts").alias("ts"),
            F.lit(0).alias("__side"),
            F.lit(None).cast("long").alias("purchase_id"),
            "click_id",
            F.col("click_ts"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("__side"),
        F.col("event_id").alias("purchase_id"),
        F.lit(None).cast("long").alias("click_id"),
        F.lit(None).cast(ev.schema["ts"].dataType).alias("click_ts"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "__side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    tagged = clicks.unionByName(purchases)
    return (
        tagged.withColumn("click_id", F.last("click_id", ignorenulls=True).over(w))
        .withColumn("click_ts", F.last("click_ts", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
        .select("purchase_id", "user_id", "ts", "click_id", "click_ts")
    )


@query(
    "tpch_q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2))
                AS DOUBLE) AS sum_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
                AS DOUBLE) AS sum_base_price,
           CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(38,4)))
                AS DECIMAL(38,4)) AS DOUBLE) AS sum_disc_price,
           CAST(CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(38,4))
                * (1 + CAST(l_tax AS DECIMAL(18,2))) AS DECIMAL(38,6)))
                AS DECIMAL(38,6)) AS DOUBLE) AS sum_charge,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*), 9) AS avg_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*), 9) AS avg_price,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*), 9) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary): the canonical scan-heavy aggregate —
    one pass over the fact table, 8 aggregates over 4 tiny groups, all
    partial-aggregated map-side so the shuffle carries ~groups×partitions
    rows regardless of scale. All money math in DECIMAL (double
    summation is order-dependent and drifts between engines); averages
    are exact decimal sums divided once, rounded identically on both
    sides."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp")
    )
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    tax = F.col("l_tax").cast("decimal(18,2)")
    disc_price = (price * (F.lit(1) - disc)).cast("decimal(38,4)")
    charge = (disc_price * (F.lit(1) + tax)).cast("decimal(38,6)")
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty).cast("decimal(38,2)").cast("double").alias("sum_qty"),
        F.sum(price).cast("decimal(38,2)").cast("double").alias("sum_base_price"),
        F.sum(disc_price).cast("decimal(38,4)").cast("double").alias("sum_disc_price"),
        F.sum(charge).cast("decimal(38,6)").cast("double").alias("sum_charge"),
        F.round(F.sum(qty).cast("double") / n, 9).alias("avg_qty"),
        F.round(F.sum(price).cast("double") / n, 9).alias("avg_price"),
        F.round(F.sum(disc).cast("double") / n, 9).alias("avg_disc"),
        n.alias("count_order"),
    )


@query(
    "tpch_q18_large_orders",
    """
    WITH big AS (
        SELECT l_orderkey
        FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
    )
    SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
           CAST(CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2))
                AS DOUBLE) AS total_qty
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY o.o_orderkey, o.o_custkey, o.o_orderdate
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume orders): an aggregate-HAVING
    subquery feeding a semi-join filter on the fact table. The inner
    aggregate and the outer aggregate shuffle on the SAME key
    (l_orderkey/o_orderkey), so Catalyst reuses the partitioning —
    and the semi-join side carries only keys, not payload."""
    li = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty).alias("__sq"))
        .filter(F.col("__sq") > 150)
        .select("l_orderkey")
    )
    o = _t(spark, sf_dir, "orders")
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_custkey", "o_orderdate")
        .agg(
            F.sum(qty).cast("decimal(38,2)").cast("double").alias("total_qty")
        )
    )


@query(
    "tpch_q10_returned_items",
    f"""
    SELECT c_custkey, c_name, n_name, revenue
    FROM (
        SELECT c.c_custkey, c.c_name, n.n_name,
               {_REV_SQL} AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1996-07-01'
        GROUP BY c.c_custkey, c.c_name, n.n_name
    )
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): which customers returned the
    most revenue in a quarter — 4-table join where the returnflag filter
    pushes into the lineitem scan and the date filter into orders, both
    BEFORE any join; nation broadcasts onto the customer side; top-20 is
    TakeOrderedAndProject. The per-customer aggregate is the only
    full-width shuffle."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_rev_col().alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "tpch_q6_forecast_revenue",
    """
    SELECT CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(38,4)))
               AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue change): THE predicate-pushdown
    showcase — three selective predicates reach the parquet scan as
    PushedFilters (row-group stats skip whole chunks), the projection
    prunes to 4 columns, and a single global aggregate returns one row.
    At 100 TB this query's cost is IO on the surviving row groups and
    nothing else."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                (
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * F.col("l_discount").cast("decimal(18,2)")
                ).cast("decimal(38,4)")
            )
            .cast("decimal(38,4)")
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "tpch_q14_promo_share",
    """
    SELECT ROUND(
               100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                   THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(38,4))
                   ELSE CAST(0 AS DECIMAL(38,4)) END) AS DOUBLE)
               / CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(38,4)))
                 AS DOUBLE), 9) AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
      AND l.l_shipdate < TIMESTAMP '1996-04-01'
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): conditional share-of-total in one
    aggregate — the part dimension broadcasts, the month filter pushes
    into the fact scan, and both the promo and total revenue sums come
    out of a single pass (no second scan for the denominator). Exact
    decimal sums; one identical double division + round per engine."""
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
    ).cast("decimal(38,4)")
    zero = F.lit("0").cast("decimal(38,4)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero))
                .cast("double")
                / F.sum(rev).cast("double"),
                9,
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "tpch_q13_customer_distribution",
    """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey,
               CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                          AND o.o_orderpriority NOT LIKE '1-%'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution): LEFT OUTER join
    with a predicate *in the join condition* (orders excluded by the
    filter still leave their customer behind with count 0 — the
    semantics WHERE would destroy), double aggregation. Both the join
    and the first groupBy key on c_custkey, so Catalyst reuses one
    hash partitioning for both — one shuffle of each table, and the
    second aggregate runs on ~tens of distinct counts (map-side
    partials shrink it to nothing). The spec's o_comment NOT LIKE
    exclusion maps to o_orderpriority (comment not in the driver's
    schema)."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderpriority")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (~o.o_orderpriority.like("1-%")),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "tpch_q16_supplier_part_counts",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_type <> 'MEDIUM'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (part/supplier relationship): NOT IN exclusion +
    COUNT(DISTINCT) per part-attribute group. The excluded-supplier set
    (spec: '%Customer%Complaints%' comments; here: negative acctbal —
    comment not in schema) is a LEFT ANTI broadcast join — the NOT IN
    rewrite that stays correct because s_suppkey is non-null, and never
    shuffles lineitem. Part is filtered then broadcast; the only
    shuffle is the distinct-aggregate, which Spark plans as two-phase
    (partial distinct on (group, suppkey) map-side first)."""
    p = (
        _t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#13")
            & (F.col("p_type") != "MEDIUM")
            & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad_s = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad_s), li.l_suppkey == bad_s.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


@query(
    "tpch_q17_small_quantity_revenue",
    """
    SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                     AS DECIMAL(38,2)) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#2' AND p.p_type = 'ECONOMY'
      AND l.l_quantity < (
          SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = l.l_partkey
      )
    """,
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): correlated scalar
    subquery computing a per-part average over the SAME fact table,
    decorrelated into a groupBy-then-join — the plan every engine
    rewrites to, expressed directly. The per-part averages are computed
    only for the ~selected parts (semi-filter BEFORE the aggregate, so
    the 100 TB scan aggregates a sliver, not the whole table); the
    threshold join is broadcast (one row per selected part). Quantities
    are integral doubles, so AVG is exact and the 0.2x threshold is
    bit-identical across engines. p_container isn't in the driver's
    schema — p_type stands in."""
    p = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#2") & (F.col("p_type") == "ECONOMY"))
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    selected = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).drop("p_partkey")
    thresholds = (
        selected.groupBy("l_partkey")
        .agg((F.lit(0.2) * F.avg("l_quantity")).alias("__qty_thresh"))
    )
    return (
        selected.join(F.broadcast(thresholds), "l_partkey")
        .filter(F.col("l_quantity") < F.col("__qty_thresh"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                .cast("decimal(38,2)")
                .cast("double")
                / F.lit(7.0)
            ).alias("avg_yearly")
        )
    )


@query(
    "tpch_q20_excess_shippers",
    """
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    WHERE s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE 'red%'
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l.l_suppkey, l.l_partkey
        HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,2))) > 50
    )
    ORDER BY s.s_name
    """,
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (excess-volume shippers): IN over a grouped-HAVING
    subquery — suppliers who moved >50 units of any red part in 1996.
    Planned as filtered-part broadcast join → partial-agg shuffle on
    (suppkey, partkey) → HAVING filter → LEFT SEMI join back to
    supplier (the IN rewrite; duplicates in the subquery never
    duplicate suppliers). The spec gates on partsupp.ps_availqty,
    which isn't in the driver's schema — the shipped-quantity HAVING
    keeps the nested group-filter shape. Quantity sums route through
    DECIMAL so the >50 cut is exact on both engines."""
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    heavy = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("__qty"))
        .filter(F.col("__qty") > 50)
        .select("l_suppkey")
    )
    s = _t(spark, sf_dir, "supplier")
    return (
        s.join(F.broadcast(heavy), s.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@query(
    "tpch_q22_dormant_accounts",
    """
    WITH potential AS (
        SELECT right(c_name, 2) AS cntrycode, c_custkey, c_acctbal
        FROM customer
        WHERE right(c_name, 2) BETWEEN '00' AND '49'
    ),
    thresh AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS avg_bal
        FROM potential WHERE c_acctbal > 0
    )
    SELECT cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
                     AS DECIMAL(38,2)) AS DOUBLE) AS totacctbal
    FROM potential pc, thresh
    WHERE pc.c_acctbal > thresh.avg_bal
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = pc.c_custkey
            AND o.o_orderdate >= TIMESTAMP '1999-01-01'
      )
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (dormant high-balance accounts): substring bucketing +
    uncorrelated scalar-average subquery + NOT EXISTS anti-join. The
    global average broadcasts as a 1-row frame (never a collect); the
    anti-join probes only the date-filtered order keys. The threshold
    is an exact decimal sum divided by an exact count in double, so the
    > comparison is bit-identical across engines. Spec adaptations for
    the driver schema: phone-prefix country codes → the customer
    name's trailing digits, restricted by a substring RANGE (half the
    buckets — an 8-code IN-list left zero qualifying customers at
    sf0.001); 'no orders at all' → 'no orders since 1999' (every
    sf0.01 customer has some order, which would make the canonical
    form vacuous). Non-vacuous at every shipped SF: 2/11/72 rows
    pre-grouping."""
    c = _t(spark, sf_dir, "customer").select(
        F.expr("right(c_name, 2)").alias("cntrycode"), "c_custkey", "c_acctbal"
    )
    potential = c.filter(F.col("cntrycode").between("00", "49"))
    thresh = potential.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_bal")
    )
    recent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        potential.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(F.broadcast(recent), F.col("c_custkey") == recent.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


@query(
    "tpch_q7_nation_volume",
    f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS l_year,
           {_REV_SQL} AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_20')
        OR (n1.n_name = 'NATION_20' AND n2.n_name = 'NATION_18'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY n1.n_name, n2.n_name, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (bilateral trade volume): a disjunctive cross-dimension
    predicate — (supplier nation, customer nation) must be one of two
    ordered pairs — over a 5-table join, grouped by ship year. Both
    nation dimensions broadcast pre-filtered to the two nations, so the
    pair predicate degenerates to a residual on two broadcast joins;
    lineitem is shuffled once, for the final aggregate. Year extraction
    happens after the date-range filter prunes the scan."""
    two = ["NATION_18", "NATION_20"]
    n1 = _t(spark, sf_dir, "nation").filter(F.col("n_name").isin(two)).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").filter(F.col("n_name").isin(two)).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s.join(F.broadcast(n1), s.s_nationkey == n1.n1_key)),
              li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(c.join(F.broadcast(n2), c.c_nationkey == n2.n2_key)),
              o.o_custkey == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .withColumn("l_year", F.year("l_shipdate").cast("bigint"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_rev_col().alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "tpch_q8_market_share",
    """
    WITH vols AS (
        SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
               CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                    AS DECIMAL(38,4)) AS volume,
               n2.n_name AS supp_nation
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n1.n_regionkey
        JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    )
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume
                              ELSE CAST(0 AS DECIMAL(38,4)) END)
                     AS DECIMAL(38,4)) AS DOUBLE)
           / CAST(CAST(SUM(volume) AS DECIMAL(38,4)) AS DOUBLE)
               AS mkt_share
    FROM vols GROUP BY o_year ORDER BY o_year
    """,
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): an 8-table snowflake with a
    conditional-aggregate ratio — NATION_5's share of ECONOMY-part
    volume sold into ASIA, by order year. Every dimension (part
    filtered ~1/6, both nation roles, region, supplier, customer)
    broadcasts; lineitem shuffles only for the per-year aggregate. The
    share is exact-decimal numerator and denominator, divided in
    DOUBLE as the single final float step on both engines."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = (
        _t(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("n1_key"))
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    vols = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c.join(F.broadcast(n1), c.c_nationkey == n1.n1_key)),
              o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(s.join(F.broadcast(n2), s.s_nationkey == n2.n2_key)),
              li.l_suppkey == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            (price * (F.lit(1) - disc)).cast("decimal(38,4)").alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast("decimal(38,4)")
    return (
        vols.groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_5", F.col("volume"))
                    .otherwise(zero)
                )
                .cast("decimal(38,4)")
                .cast("double")
                / F.sum("volume").cast("decimal(38,4)").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "tpch_q9_product_profit",
    """
    SELECT n.n_name AS nation,
           CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
           CAST(CAST(SUM(
               CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                    AS DECIMAL(38,4))
               - CAST(CAST(p.p_retailprice AS DECIMAL(18,2))
                      * CAST(l.l_quantity AS DECIMAL(18,2))
                      AS DECIMAL(38,4))
           ) AS DECIMAL(38,4)) AS DOUBLE) AS sum_profit
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit): profit = discounted revenue minus
    cost, per supplier nation per order year, for parts matching a name
    substring. The spec costs via partsupp.ps_supplycost (not in the
    driver's schema) — p_retailprice x quantity stands in, keeping the
    revenue-minus-cost expression shape. The %substring% predicate
    can't prune the part scan (no prefix), but part is a dimension:
    filter, broadcast, and the fact table still only shuffles for the
    aggregate. All money math is exact decimal; one final DOUBLE
    cast."""
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gear%"))
        .select("p_partkey", "p_retailprice")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", F.col("n_name").alias("nation"))
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    cost = (
        F.col("p_retailprice").cast("decimal(18,2)")
        * F.col("l_quantity").cast("decimal(18,2)")
    ).cast("decimal(38,4)")
    profit = (price * (F.lit(1) - disc)).cast("decimal(38,4)") - cost
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s.join(F.broadcast(n),
                                 s.s_nationkey == n.n_nationkey)),
              li.l_suppkey == F.col("s_suppkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .select("nation", F.year("o_orderdate").cast("bigint").alias("o_year"),
                profit.alias("__profit"))
        .groupBy("nation", "o_year")
        .agg(F.sum("__profit").cast("decimal(38,4)").cast("double")
             .alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "tpch_q15_top_supplier",
    f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no, {_REV_SQL} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): a derived revenue view consumed twice —
    once as the join input, once inside a scalar MAX subquery.
    Expressed as aggregate → 1-row max → broadcast equality filter, so
    the revenue aggregate is computed once and reused (Spark plans the
    reused frame as an exchange-reuse or recompute of a tiny 100-row
    agg — either is cheap; the 100 TB input is scanned once per use of
    the quarter-filtered slice, pruned at the parquet level). Revenue
    equality is safe: both sides are the same exact-decimal sum cast to
    DOUBLE once."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(_rev_col().alias("total_revenue"))
    )
    top = revenue.agg(F.max("total_revenue").alias("__max_rev"))
    s = _t(spark, sf_dir, "supplier")
    return (
        s.join(F.broadcast(revenue), s.s_suppkey == revenue.supplier_no)
        .crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("__max_rev"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q19_disjunctive_revenue",
    f"""
    SELECT {_REV_SQL} AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue, disjunctive predicates): three
    OR'd brand/size/quantity conjunctions spanning BOTH join sides.
    Catalyst extracts the join-key conjunct and pushes the common
    single-side simplifications (the p_brand IN superset, the quantity
    range hull) below the join; the cross-side residual evaluates on
    the joined rows. Part pre-filters to the union of the three brand
    branches and broadcasts — the shape the spec designed to punish
    engines that can't split disjunctions. (l_shipmode/l_shipinstruct
    conjuncts dropped: not in the driver's schema.)"""
    p = _t(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#3")
        & (F.col("p_size") >= 1)
    ).select("p_partkey", "p_brand", "p_size")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    q = F.col("l_quantity")
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & q.between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(branch)
        .agg(_rev_col().alias("revenue"))
    )


@query(
    "tpch_q21_waiting_suppliers",
    """
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE o.o_orderstatus = 'F' AND n.n_name = 'NATION_3'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > l1.l_shipdate
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    """,
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting): the hardest spec
    shape — EXISTS and NOT EXISTS, both correlated to the SAME fact
    table, on the same key with inequality residuals. Planned as a
    LEFT SEMI then LEFT ANTI join of lineitem against itself, both
    keyed on l_orderkey (equi-shuffle with the supplier/date terms as
    residuals — never a cartesian). The nation filter broadcasts
    through supplier before touching the fact side. Spec adaptation:
    'received after commit date' → 'shipped >60 days after order'
    (receipt/commit dates not in the driver's schema); multi-supplier
    orders and the was-the-last-to-ship anti-condition are kept
    verbatim."""
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    l1 = (
        li.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_orderkey", "l_suppkey", "l_shipdate", "s_name")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"),
        F.col("l_suppkey").alias("l2_suppkey"),
    )
    l3 = li.select(
        F.col("l_orderkey").alias("l3_orderkey"),
        F.col("l_suppkey").alias("l3_suppkey"),
        F.col("l_shipdate").alias("l3_shipdate"),
    )
    waited = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("l2_orderkey"))
        & (F.col("l_suppkey") != F.col("l2_suppkey")),
        "left_semi",
    ).join(
        l3,
        (F.col("l_orderkey") == F.col("l3_orderkey"))
        & (F.col("l_suppkey") != F.col("l3_suppkey"))
        & (F.col("l3_shipdate") > F.col("l_shipdate")),
        "left_anti",
    )
    return (
        waited.groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


@query(
    "tpch_q11_important_shares",
    """
    WITH pr AS (
        SELECT l_partkey,
               SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))
                        AS DECIMAL(38,4))) AS rev
        FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT SUM(rev) AS total, COUNT(*) AS n_parts FROM pr)
    SELECT pr.l_partkey AS p_partkey,
           CAST(CAST(pr.rev AS DECIMAL(38,4)) AS DOUBLE) AS part_revenue
    FROM pr, tot
    WHERE CAST(pr.rev AS DOUBLE)
          > 1.5 * CAST(tot.total AS DOUBLE) / CAST(tot.n_parts AS DOUBLE)
    ORDER BY part_revenue DESC, p_partkey
    """,
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): per-group value filtered
    against a FRACTION OF THE GLOBAL TOTAL — the grouped-HAVING-vs-
    scalar-subquery pattern. The global total re-aggregates the per-part
    aggregate (tiny) and broadcasts as one row; the fact table shuffles
    once, for the per-part aggregate both sides reuse. The spec's
    partsupp value (ps_supplycost x ps_availqty) isn't in the driver's
    schema — lineitem revenue per part stands in; the spec's 0.0001/SF
    HAVING fraction becomes 1.5x the mean per-part revenue, which is
    SCALE-INVARIANT (a fixed share fraction goes vacuous as the part
    count grows — measured 971 rows at sf0.01 but 0 at sf0.1).
    Exact-decimal sums; the threshold compare is one identical double
    expression per engine."""
    li = _t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    rev_exact = F.sum((price * (F.lit(1) - disc)).cast("decimal(38,4)"))
    pr = li.groupBy("l_partkey").agg(rev_exact.alias("__rev"))
    tot = pr.agg(
        F.sum("__rev").alias("__total"),
        F.count(F.lit(1)).alias("__n_parts"),
    )
    return (
        pr.crossJoin(F.broadcast(tot))
        .filter(
            F.col("__rev").cast("double")
            > F.lit(1.5)
            * F.col("__total").cast("double")
            / F.col("__n_parts").cast("double")
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("__rev").cast("decimal(38,4)").cast("double")
            .alias("part_revenue"),
        )
        .orderBy(F.col("part_revenue").desc(), "p_partkey")
    )


@query(
    "tpch_q2_min_cost_supplier",
    """
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    costed AS (
        SELECT p.p_partkey, s.s_suppkey, s.s_name, s.s_acctbal
        FROM part p
        JOIN ps ON ps.l_partkey = p.p_partkey
        JOIN supplier s ON s.s_suppkey = ps.l_suppkey
        WHERE p.p_size = 15 AND p.p_type = 'SMALL'
    )
    SELECT c.p_partkey, c.s_suppkey, c.s_name, c.s_acctbal
    FROM costed c
    WHERE c.s_acctbal = (
        SELECT MIN(c2.s_acctbal) FROM costed c2
        WHERE c2.p_partkey = c.p_partkey
    )
    ORDER BY c.p_partkey, c.s_suppkey
    """,
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): a correlated MIN subquery
    over the SAME derived relation, decorrelated into aggregate + self
    equi-join — per part, every supplier tying on the minimum. The
    part-supplier bridge is the distinct (partkey, suppkey) projection
    of lineitem (the driver schema has no partsupp); part is filtered
    ~1/300 then broadcast, so the bridge dedup is the only fact-side
    shuffle. s_acctbal stands in for ps_supplycost; equality on it is
    safe — both sides compare the same untransformed double column."""
    p = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_size") == 15) & (F.col("p_type") == "SMALL"))
        .select("p_partkey")
    )
    bridge = (
        _t(spark, sf_dir, "lineitem")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .select("p_partkey", "l_suppkey")
        .dropDuplicates()
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_acctbal")
    costed = bridge.join(F.broadcast(s), bridge.l_suppkey == s.s_suppkey).select(
        "p_partkey", "s_suppkey", "s_name", "s_acctbal"
    )
    mins = costed.groupBy(F.col("p_partkey").alias("__pk")).agg(
        F.min("s_acctbal").alias("__min_bal")
    )
    return (
        costed.join(
            F.broadcast(mins),
            (F.col("p_partkey") == F.col("__pk"))
            & (F.col("s_acctbal") == F.col("__min_bal")),
        )
        .select("p_partkey", "s_suppkey", "s_name", "s_acctbal")
        .orderBy("p_partkey", "s_suppkey")
    )


@query(
    "tpch_q12_shipmode_priority",
    """
    SELECT ship_mode,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM (
        SELECT l_orderkey,
               CASE l_linenumber % 4
                   WHEN 0 THEN 'MAIL' WHEN 1 THEN 'SHIP'
                   WHEN 2 THEN 'RAIL' ELSE 'TRUCK' END AS ship_mode
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
    ) l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE ship_mode IN ('MAIL', 'SHIP')
    GROUP BY ship_mode
    ORDER BY ship_mode
    """,
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes and order priority): the last shape of
    the public 22-query suite — two-branch conditional aggregation over
    lineitem ⋈ orders with an IN filter on ship mode. The driver schema
    lacks l_shipmode/l_commitdate/l_receiptdate, so ship mode derives
    deterministically from l_linenumber % 4 (both engines compute the
    identical derivation) and the receipt-year window stands in as a
    ship-date year window — the aggregation/join shape is the spec's.

    Scale: the year window + mode IN-filter prune lineitem at the scan
    (PushedFilters on l_shipdate; the mode filter folds to
    `l_linenumber % 4 IN (0,1)` post-scan), projection prunes to 3
    columns, and the orderkey join is the one shuffle — at 100 TB both
    sides are facts, so this is the canonical AQE-planned sort-merge
    join keyed on the join column, with the two conditional counts
    computed map-side before the final 2-row aggregate."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .withColumn(
            "ship_mode",
            F.element_at(
                F.array(F.lit("MAIL"), F.lit("SHIP"), F.lit("RAIL"), F.lit("TRUCK")),
                (F.col("l_linenumber") % 4 + 1).cast("int"),
            ),
        )
        .filter(F.col("ship_mode").isin("MAIL", "SHIP"))
        .select("l_orderkey", "ship_mode")
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("ship_mode")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_mode")
    )
