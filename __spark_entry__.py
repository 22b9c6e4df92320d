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
# in dict order. Round-13 rotation policy (same staleness-wins rule as
# r09-r12): (a) everything NEW or modified in round 13 — 16 slots:
# dedup_containment_kmv (new: KMV bottom-k pre-screen, exact-verified
# output against the exact-containment oracle), web_cap_two_phase
# (new: salted two-phase top-k cap; oracle = the plain window —
# exactness by construction), web_cap_prefilter (operator rework: the
# verifier now rides in-plan via assert_true over the passer-count
# window, min-prefix escape rows make host wipeout impossible),
# prune_prototype_distance (ragged/NULL-vector guard — the r12
# advisory), dedup_minhash_lsh + dedup_incremental_minhash (oracles
# now mirror the operator's zero-shingle semantics for token-less
# docs — the r12 advisory), web_corpus_prep (consumes the reworked
# cap operator + persisted funnel frames), sample_epoch_shuffle (new:
# deterministic seed-keyed epoch shuffle), text_soft_dedup_weights
# (new: SoftDeDup-shaped n-gram-commonness reweighting),
# sample_dsir_select (new: DSIR-shaped hashed importance selection),
# dedup_minhash_oph (new: one-permutation-hashing MinHash + rotation
# densification), similarity_margin_bitext (new: Artetxe-Schwenk
# margin-based bitext mining), sample_token_budget_select (new:
# best-N-tokens budget gate), monitor_ks_two_sample (new: exact
# two-sample KS drift gate), sample_global_rank (new: global
# ROW_NUMBER + exact NTILE without a global sort — the curriculum
# primitive), stream_dedup_admission (new: streaming corpus-dedup
# admission, first-seen-wins + idempotent replay); then (b) all 28
# remaining r07-era rows
# — after this round NO query's newest driver row is older than r08
# (fct_orders stays out per standing policy: entry() smoke-runs it
# and gate.py re-verifies it every round); then (c) the alphabetical
# first 6 of the 47 r08-era rows. The remaining 41 r08-era rows are
# first in line for round 14. Every displaced query
# keeps its historical driver row and is re-verified on current code
# each round by tools/gate.py over the full catalog (GATE.json).
_CHECK_FIRST = [
    # new / modified in round 13
    "dedup_containment_kmv",
    "web_cap_two_phase",
    "web_cap_prefilter",
    "prune_prototype_distance",
    "dedup_minhash_lsh",
    "dedup_incremental_minhash",
    "web_corpus_prep",
    "sample_epoch_shuffle",
    "text_soft_dedup_weights",
    "sample_dsir_select",
    "dedup_minhash_oph",
    "similarity_margin_bitext",
    "sample_token_budget_select",
    "monitor_ks_two_sample",
    "sample_global_rank",
    "stream_dedup_admission",
    # stalest: all 28 remaining r07-era driver rows
    "incremental_microbatch_sim",
    "json_extract",
    "metric_anomaly_daily",
    "metric_revenue_monthly",
    "pivot_status_by_year",
    "pyds_jsonl_sink_roundtrip",
    "runner_concurrent_dag",
    "runner_slimci_retry",
    "runner_source_freshness",
    "scalar_functions",
    "scd2_dim_asof_resolve",
    "scd2_window_rebuild",
    "semi_join_exists",
    "set_ops",
    "similarity_brute_topk",
    "similarity_ivf",
    "similarity_quantized_topk",
    "sketch_rollup_merge",
    "stream_stateful_totals_tws",
    "table_stats_profile",
    "text_decontaminate",
    "text_gopher_rules",
    "text_hashed_linear_score",
    "text_quality_score",
    "text_tfidf_topk",
    "time_bucket_agg",
    "topk_per_group",
    "zorder_layout_stats",
    # next-stalest: alphabetical first 6 of the 47 r08-era rows
    "bm25_topk",
    "dbt_utils_surrogate_key",
    "dedup_cluster_representative",
    "drift_chi2_event_types",
    "er_golden_records",
    "flatten_with_ordinality",
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
