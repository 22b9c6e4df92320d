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


# The driver's correctness gate verifies the FIRST 50 queries() entries in
# dict order. The round-6 rotation targets STALENESS, not novelty (VERDICT
# r05 #1): every name here is either (a) brand-new this round (tpch_q12,
# the two pyds write/stream queries), or (b) a query whose implementation
# file changed AFTER its latest driver row — queries_sql_breadth.py /
# queries_udfs.py / operators/incremental.py / streaming/events.py were
# edited in round 5 after the r04 window froze, and runner.py /
# plans/registry.py / sources/pyds.py changed in round 6 — or (c) one of
# the oldest surviving rows (r03, queries.py) so no row ages past three
# rounds. Driver coverage by round: r03 = first 50 registered, r04/r05 =
# their rotations, r06 = this list; the four unions cover every query
# registered through round 6. The 100 out-of-window names are re-verified
# in-repo by tools/gate.py (plan lint + oracle + vacuity) each round —
# GATE.json records the latest all-queries verdict.
_CHECK_FIRST = [
    # flagship (registry/runner code path changed in round 6)
    "fct_orders",
    # brand-new this round
    "tpch_q12_shipmode_priority",
    "pyds_jsonl_sink_roundtrip",
    "pyds_stream_drain",
    "dedup_semantic",
    "dedup_incremental_corpus",
    "cogroup_conversion_stats",
    # sources/pyds.py + runner.py changed in round 6 after their r05 rows
    "pyds_synthetic_corpus",
    "runner_pipeline_gate",
    "runner_source_freshness",
    "runner_slimci_retry",
    # queries_sql_breadth.py changed in round 5 after these r03/r04 rows
    "array_agg_ops",
    "conditional_agg_filter",
    "correlated_scalar_subquery",
    "incremental_delete_insert_sim",
    "incremental_insert_overwrite_sim",
    "lateral_explode",
    "minmax_by_agg",
    "moment_stats",
    "null_safe_join",
    "percentile_agg",
    "range_join_bucketed",
    "salted_skew_join",
    "seed_csv_inference",
    "string_funcs",
    "two_phase_distinct_skew",
    "unpivot_stack",
    "window_frames",
    # streaming/events.py changed in rounds 5+6 after these rows
    "stream_dedup",
    "stream_session_stats",
    "stream_stateful_totals",
    "stream_static_enrich",
    "stream_stream_join",
    "stream_window_counts",
    "stream_stateful_totals_tws",
    "stream_file_sink_exactly_once",
    # queries_udfs.py changed in round 5 after these r03 rows
    "udaf_decimal_sum",
    "udtf_chunk_words",
    # operators/incremental.py changed in rounds 5+6 after its r03 row
    "incremental_merge_sim",
    # oldest surviving driver rows (r03, queries.py)
    "stg_projection_rename",
    "dq_accepted_values",
    "dq_not_null",
    "dq_relationships",
    "dq_singular_revenue_positive",
    "dq_unique",
    "dq_verdict",
    "filter_predicate",
    "groupby_sum_ordinal",
    "left_join_null_fill",
    "null_arithmetic",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator; (spark, sf_dir) -> DataFrame."""
    ordered = {k: QUERIES[k] for k in _CHECK_FIRST if k in QUERIES}
    ordered.update({k: v for k, v in QUERIES.items() if k not in ordered})
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per queries() key (omitted ⇒ rows-only)."""
    return dict(ORACLE_SQL)
