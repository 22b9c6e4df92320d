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
# dict order. The round-7 rotation (VERDICT r06 #2) targets STALENESS:
# (a) every query whose implementation changed in round 7 — operators/
# dedup.py (minhash_banded refactor + ngram max_doc_freq, which
# dedup_connected_components consumes), operators/similarity.py (cogroup
# key-typing + auto-partitioning), operators/incremental.py (backup-swap
# publish, used by all five incremental-family queries), runner.py +
# plans/registry.py (run ordering, full-config checksums → slim-CI),
# sources/pyds.py (append-manifest merge, atomic commit), compat.py
# (env-var-only protobuf → tws) — plus (b) the 31 oldest surviving
# driver rows (r03-era breadth/dedup/text queries), so after this round
# no query's latest driver row predates r05 — plus (c) the brand-new
# runner_concurrent_dag (thread-pool DAG execution, Barrier-proven
# in-driver) and the three operators born this round (text_gopher_rules,
# dedup_span_ngram, zorder_layout_stats — never had a driver row).
# dedup_semantic / dedup_incremental_corpus / dedup_embedding_cosine /
# incremental delete_insert+insert_overwrite (fresh r06 rows, their
# specific functions untouched or family-covered by in-window siblings)
# are left to tools/gate.py, which re-verifies ALL registered queries on
# current code every round (GATE.json).
_CHECK_FIRST = [
    # flagship (registry/runner code path changed again in round 7)
    "fct_orders",
    # brand-new this round: concurrent DAG materialization (A20 ext)
    "runner_concurrent_dag",
    # runner.py / plans/registry.py changed (keep-going order, checksums)
    "runner_pipeline_gate",
    "runner_source_freshness",
    "runner_slimci_retry",
    # sources/pyds.py changed THIS round in the sink commit path only —
    # jsonl_sink_roundtrip exercises it; the reader/stream queries keep
    # fresh r06 rows and yield their slots to brand-new round-7 queries
    "pyds_jsonl_sink_roundtrip",
    # compat.py changed (protobuf opt-in moved to harness)
    "stream_stateful_totals_tws",
    # operators/similarity.py changed (typed key, ts_col, auto-sizing)
    "cogroup_conversion_stats",
    # operators/incremental.py changed (backup-swap publish);
    # microbatch_sim exercises the changed publish path for the family —
    # merge/delete_insert/insert_overwrite keep fresh r06 rows and
    # yield their slots to the brand-new round-7 queries below
    "incremental_microbatch_sim",
    "dynamic_table_refresh",
    # operators/dedup.py changed (banding refactor, max_doc_freq)
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_connected_components",
    # BRAND-NEW round-7 operators (first-ever driver rows): Gopher
    # rule gate, Lee-et-al duplicated-span accounting + removal cut,
    # Z-order layout, integer-exact PageRank
    "text_gopher_rules",
    "text_hashed_linear_score",
    "dedup_span_ngram",
    "dedup_span_removal",
    "zorder_layout_stats",
    "graph_pagerank_purchases",
    # BRAND-NEW round-7 (second batch): CDC log application (B1
    # family), Bloom membership pre-filter (the incremental-dedup
    # scale sibling), HLL sketch-partial rollup (persisted mergeable
    # partials). Their three slots come from the r03 text-family rows
    # text_repetition_stats / text_pii_pseudonymize / text_ngram_counts
    # — each pinned by exact-count pytests and by in-window same-file
    # siblings (gopher_rules / hashed_linear_score exercise the same
    # operators/text.py scan machinery), and still gate.py-verified on
    # current code every round.
    "cdc_apply_latest",
    "dedup_bloom_prefilter",
    "sketch_rollup_merge",
    # BRAND-NEW round-7 (third batch): streaming CDC upsert sink
    # (tombstone state table, split-invariance vs the batch oracle),
    # count-min-sketch heavy hitters (bit-exact grid parity), and the
    # ANALYZE-style column profiler. Slots from the r03 rows
    # text_token_stats / text_language_id / text_fingerprint — all
    # map-only Catalyst projections pinned by the hypothesis property
    # suite (tests/test_text_properties.py); fingerprint() itself is
    # transitively exercised by the in-window bloom + incremental-dedup
    # rows (it is their hash input), and gate.py re-verifies all three
    # on current code every round.
    "cdc_stream_apply",
    "cms_heavy_hitters",
    "table_stats_profile",
    # BRAND-NEW round-7 (fourth batch): SCD-2 consumption (facts
    # resolved to the dimension version valid at event time, as-of
    # plan vs BETWEEN-join oracle) and the metrics semantic layer
    # (declared measure -> grain query over fct_orders). Slots from
    # r03 rows asof_last_purchase (the identical union+window as-of
    # machinery is in-window via scd2_dim_asof_resolve, which
    # exercises the harder two-table + tombstone-tie case) and
    # distinct_agg (count_distinct is in-window via table_stats_profile
    # NDV and sketch_rollup_merge exact twins); both stay gate.py-
    # verified every round.
    "scd2_dim_asof_resolve",
    "metric_revenue_monthly",
    # BRAND-NEW round-7 (fifth batch): metric anomaly monitor
    # (trailing-baseline 3-sigma verdicts in exact integer arithmetic,
    # planted spikes verified). Slot from r03 window_running_agg — the
    # running-window machinery is in-window via scd2_dim_asof_resolve
    # and metric_anomaly_daily itself (both window-over-key plans);
    # gate.py still verifies it every round.
    "metric_anomaly_daily",
    # oldest surviving driver rows (r03): SQL breadth over queries_sql_breadth
    "topk_per_group",
    "set_ops",
    "semi_join_exists",
    "scalar_functions",
    "date_functions",
    "json_extract",
    "time_bucket_agg",
    "grouping_rollup",
    "pivot_status_by_year",
    # oldest surviving driver rows (r03): snapshots / dedup / similarity
    "scd2_window_rebuild",
    "dedup_exact",
    "dedup_containment",
    "dedup_simhash",
    "dedup_winnowing",
    "fuzzy_join_levenshtein",
    "similarity_brute_topk",
    "similarity_ivf",
    "similarity_quantized_topk",
    # oldest surviving driver rows (r03): text-analysis family
    "text_quality_score",
    "text_tfidf_topk",
    "text_decontaminate",
    "corpus_prep_pipeline",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator; (spark, sf_dir) -> DataFrame."""
    ordered = {k: QUERIES[k] for k in _CHECK_FIRST if k in QUERIES}
    ordered.update({k: v for k, v in QUERIES.items() if k not in ordered})
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per queries() key (omitted ⇒ rows-only)."""
    return dict(ORACLE_SQL)
