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
# r09): (a) everything NEW or modified in round 10 — 38 slots: the
# sequence-analytics family (IGNORE NULLS navigation, Markov
# transitions, dialogue-turn validation, cohort retention, MAD
# outliers), WIDTH_BUCKET histogram, C4 text normalization, the
# interval-overlap join, JL random projection, the multimodal/audio +
# spatial + MATCH_RECOGNIZE + BPE-tokenizer + conditional-event rows,
# web_domain_psl whose operator changed (case-insensitive matching,
# widths derived from the suffix dim), plus the second wave (multiset
# set ops, PoP metrics, bitmap NDV, regex breadth, dynamic pivot,
# equi-depth histogram, triangle counting, geohash, A/B z-test,
# negative sampling, table checksum, array breadth, media resize,
# k-anonymity, weighted percentile, full-sync MERGE, running-distinct
# bitmap window, winsorize, CUSUM); then (b) the 12 stalest r05-era
# rows. The 21 remaining r05-era rows (dedup_subdoc_chunks,
# map_type_roundtrip, recursive_cte_hierarchy, try_safe_arithmetic,
# variant_shred_agg, window_range_interval,
# tpch_q2/q7/q8/q9/q11/q13/q15/q16/q17/q19/q20/q21/q22,
# hll_and_quantile_sketch, udf_compression_ratio) and all r06-era rows
# are first in line for round 11. Every displaced query keeps its historical driver row and
# is re-verified on current code each round by tools/gate.py over the
# full catalog (GATE.json).
_CHECK_FIRST = [
    # new / modified in round 10
    "window_running_distinct",
    "winsorize_values",
    "metric_cusum_changepoint",
    "sample_weighted_percentile",
    "incremental_merge_full_sync",
    "governance_k_anonymity",
    "mm_resize_grid",
    "table_checksum_reconcile",
    "array_functions_breadth",
    "graph_triangle_count",
    "geo_geohash_encode",
    "ab_test_ztest",
    "sample_negatives_contrastive",
    "set_ops_all",
    "metric_period_over_period",
    "bitmap_ndv_rollup",
    "regex_function_breadth",
    "pivot_dynamic",
    "histogram_equi_depth",
    "window_nav_ignore_nulls",
    "markov_transitions",
    "chat_turn_stats",
    "cohort_retention",
    "mad_outlier_flags",
    "histogram_width_bucket",
    "text_normalize",
    "interval_overlap_pairs",
    "embedding_random_projection",
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
