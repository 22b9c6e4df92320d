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

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import local_env  # noqa: E402,F401  (harness opt-in: protobuf site for tws)

from olist_snowflake_dbt_spark.queries import QUERIES, ORACLE_SQL  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.
    Routed through the registered query so entry() and the oracle-checked
    fct_orders share one code path (incl. the DOUBLE presentation casts)."""
    return QUERIES["fct_orders"](spark, "/root/testdata/sf0.001")


# The driver's correctness gate verifies the FIRST 50 queries() entries
# in dict order. Round-10 rotation policy (same staleness-wins rule as
# r09): (a) everything NEW in round 10 — match_recognize_funnel (row-
# pattern operator) + match_recognize_vshape (PREV-navigation shape),
# tokenizer_pair_freqs + tokenizer_bpe_train + tokenizer_bpe_segment
# (BPE trainer/encoder with the unrolled-SQL oracle),
# window_conditional_events (conditional-event window trio),
# mm_audio_fpdedup (audio member of the multimodal dedup triad),
# geo_grid_epsilon_join + geo_nearest_within (grid-blocked spatial
# ε-join / bounded kNN vs brute-force oracles) — plus web_domain_psl,
# whose operator changed
# (case-insensitive matching, widths derived from the suffix dim);
# then (b) ALL 33 remaining r05-era rows (the oldest surviving driver
# rows after r09 cleared r03/r04), and (c) the first 7 r06-era rows in
# file order. Every displaced query keeps its historical driver row
# and is re-verified on current code each round by tools/gate.py over
# the full catalog (GATE.json). After this round no query's newest
# driver row is older than r06, and the remaining 35 r06-era rows are
# first in line for round 11.
_CHECK_FIRST = [
    # new / modified in round 10
    "mm_audio_fpdedup",
    "geo_grid_epsilon_join",
    "geo_nearest_within",
    "match_recognize_funnel",
    "match_recognize_vshape",
    "window_conditional_events",
    "tokenizer_pair_freqs",
    "tokenizer_bpe_train",
    "tokenizer_bpe_segment",
    "web_domain_psl",
    # stalest: r05-era driver rows (all 33 that remain)
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
    "hll_and_quantile_sketch",
    "udf_compression_ratio",
    # stalest: oldest r06-era driver rows (10 of 42, file order)
    "stg_projection_rename",
    "filter_predicate",
    "groupby_sum_ordinal",
    "left_join_null_fill",
    "null_arithmetic",
    "dq_unique",
    "dq_not_null",
]
# fct_orders (green r01–r07) stays out of the window again: entry()
# smoke-runs it every round and gate.py re-verifies it on current code.



def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator; (spark, sf_dir) -> DataFrame."""
    ordered = {k: QUERIES[k] for k in _CHECK_FIRST if k in QUERIES}
    ordered.update({k: v for k, v in QUERIES.items() if k not in ordered})
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per queries() key (omitted ⇒ rows-only)."""
    return dict(ORACLE_SQL)
