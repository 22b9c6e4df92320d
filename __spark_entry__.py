"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship fct_orders pipeline analogue at sf0.001.
``queries()`` / ``oracle_sql()`` expose one entry per implemented operator
from SURVEY.md §2 (+ the LLM-pipeline extensions), checked by the driver
against DuckDB at sf0.01.

Determinism policy for the oracle compare: money/aggregate math is routed
through DECIMAL on BOTH sides (exact, order-independent — double summation
would drift in the last ulp between engines); every computed column is
aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from olist_snowflake_dbt_spark.queries import QUERIES, ORACLE_SQL


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.
    Routed through the registered query so entry() and the oracle-checked
    fct_orders share one code path (incl. the DOUBLE presentation casts)."""
    return QUERIES["fct_orders"](spark, "/root/testdata/sf0.001")


# The driver's correctness gate verifies the FIRST 50 queries() entries in
# dict order. This priority list rotates the round-5 window onto: the 25
# queries registered in round 4 AFTER the r04 window froze (no driver row
# yet; all pass tools/check_oracle.py locally), the 18 queries new in round
# 5 (runner_pipeline_gate, runner_source_freshness, dedup_subdoc_chunks,
# map_type_roundtrip,
# TPC-H Q2/7/8/9/11/13/15/16/17/19/20/21/22), the 2 that were rows-only through
# r04 and now carry exact-twin oracles (hll_and_quantile_sketch,
# udf_compression_ratio), the flagship fct_orders, and 4 safety-critical
# re-verifies. Driver coverage by
# round: r03 checked the first 50 registered, r04 the 50-name rotation in
# its window, r05 this list — the three unions cover every query
# registered through round 5; anything registered later needs a future
# rotation before claiming a driver row.
_CHECK_FIRST = [
    # flagship
    "fct_orders",
    # round-4 registrations with no driver row yet (rotation targets)
    "array_hof_stats",
    "batch_session_window",
    "corr_regression_agg",
    "cube_aggregate",
    "date_spine_gaps",
    "doc_length_histogram",
    "full_outer_reconcile",
    "grouping_sets_mix",
    "incremental_microbatch_sim",
    "pyds_synthetic_corpus",
    "quality_quantile_filter",
    "sample_importance_weighted",
    "stream_sliding_window",
    "text_corpus_freq_score",
    "tpch_q1_pricing_summary",
    "tpch_q3_priority_revenue",
    "tpch_q4_late_orders",
    "tpch_q5_region_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items",
    "tpch_q14_promo_share",
    "tpch_q18_large_orders",
    "try_safe_arithmetic",
    "variant_shred_agg",
    "window_range_interval",
    # new in round 5
    "runner_pipeline_gate",
    "runner_source_freshness",
    "tpch_q2_min_cost_supplier",
    "tpch_q7_nation_volume",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q11_important_shares",
    "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_part_counts",
    "tpch_q17_small_quantity_revenue",
    "tpch_q19_disjunctive_revenue",
    "tpch_q20_excess_shippers",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_dormant_accounts",
    "dedup_subdoc_chunks",
    "map_type_roundtrip",
    "recursive_cte_hierarchy",
    # rows-only through r04, now with exact-twin oracles
    "hll_and_quantile_sketch",
    "udf_compression_ratio",
    # safety-critical re-verifies (green in r03/r04; kept in-window)
    "dedup_minhash_lsh",
    "dedup_connected_components",
    "dedup_embedding_cosine",
    "similarity_ann_lsh",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator; (spark, sf_dir) -> DataFrame."""
    ordered = {k: QUERIES[k] for k in _CHECK_FIRST if k in QUERIES}
    ordered.update({k: v for k, v in QUERIES.items() if k not in ordered})
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per queries() key (omitted ⇒ rows-only)."""
    return dict(ORACLE_SQL)
