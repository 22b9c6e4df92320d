"""Scale-proof lane (VERDICT r06 #1): measure the sf0.1 -> sf1 scaling
ratio of the most expensive operators and publish it, converting the
100-TB design claims from plan-shape arguments into a measured curve.

Runs each query min-of-N at BOTH scale factors inside one session
(shared JVM/codegen warmup, per-query cache/GC hygiene identical to
bench.py), then writes SCALING.json:

    {"data_ratio": 10, "queries": {name: {"sf0.1": s, "sf1": s,
     "ratio": r}}, ...}

Reading the ratios: the data grows 10x, so a perfectly linear operator
with zero fixed cost shows ratio 10; every query carries 0.3-2 s of
fixed session/plan/Python-worker setup that does NOT grow, so healthy
ratios land well under 10. A ratio >> 10 means super-linear work —
each one must carry a named cause or a fix (SCALE.md records the
adjudication).

Usage: python tools/scale_bench.py [--runs 2] [--only q1,q2,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import local_env  # noqa: E402,F401

# the ~16 most expensive / scale-critical operators (bench top-list +
# the deliberate fact-fact shuffles): every dedup family member, ANN,
# stateful streaming, the cogroup Arrow lane, and the TPC-H heavies
SCALE_QUERIES = [
    "fct_orders",
    "tpch_q1_pricing_summary",
    "tpch_q9_product_profit",
    "tpch_q12_shipmode_priority",
    "tpch_q18_large_orders",
    "tpch_q21_waiting_suppliers",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_semantic",
    "dedup_embedding_cosine",
    "dedup_connected_components",
    "similarity_ann_lsh",
    "stream_stateful_totals_tws",
    "cogroup_conversion_stats",
    # breadth: one representative per remaining family (streaming
    # windows, sessionization, text, corpus prep, sub-doc dedup, fuzzy
    # join, clustering, IVF ANN, distribution-heavy TPC-H, CTAS)
    "stream_window_counts",
    "sessionize_events",
    "text_decontaminate",
    "corpus_prep_pipeline",
    "dedup_subdoc_chunks",
    "fuzzy_join_levenshtein",
    "kmeans_clusters",
    "similarity_ivf",
    "tpch_q13_customer_distribution",
    "materialize_table_roundtrip",
    # round-7 additions: duplicated-span accounting is gram-explode
    # heavy (the round's most data-proportional op); the Gopher gate and
    # Z-order audit prove the map-only / single-shuffle claims scale
    "dedup_span_ngram",
    "text_gopher_rules",
    "zorder_layout_stats",
    # round-7 additions (second wave): the bloom build folds the corpus
    # into a fixed-size bitmap (ratio should be ~explode cost), the CMS
    # grid is the fixed-key-domain aggregate claim, CDC apply is the
    # map-side max_by vs full-log-window claim, the sketch rollup and
    # profiler are scan-proportional single aggregates, and the
    # streaming CDC sink carries fixed checkpoint cost + batch merges
    "dedup_bloom_prefilter",
    "cms_heavy_hitters",
    "cdc_apply_latest",
    "cdc_stream_apply",
    "sketch_rollup_merge",
    "table_stats_profile",
    # round-8 continuation: PQ's exhaustive-ADC scan is the most
    # data-proportional new op (encode + code-table scan both grow),
    # ER's block join and the erasure rewrite are the new shuffle/
    # broadcast claims, the compaction row prices its inherent full
    # repartition, and the holdout split must stay scan-bound
    "similarity_pq_adc",
    "er_golden_records",
    "governance_erasure_cascade",
    "layout_compaction_roundtrip",
    "sample_time_holdout",
    # round-8 second wave: the left-outer stream join prices join-state
    # eviction, URL canonicalization must stay map-only scan-bound,
    # listagg/qualify/median are the new one-exchange window/agg claims,
    # MMR's candidate stage is the data-proportional part (the greedy
    # kernel is bounded by the cap), and the partial-update merge adds
    # one extra key join over plain merge
    "stream_stream_left_outer",
    "web_host_url_stats",
    "listagg_within_group",
    "qualify_keep_latest",
    "median_mode_disc",
    "retrieval_mmr_rerank",
    "incremental_merge_update_columns",
    # round-8 closers: the composed web funnel (scan + window + dedup
    # aggregate chain), the gap-fill spine (output ∝ key-spans, not
    # input rows), the FLATTEN fan-out, the polymorphic-UDTF Python
    # lane, and the map-only surrogate-key projection
    "web_corpus_prep",
    "gapfill_locf_interp",
    "flatten_with_ordinality",
    "udtf_polymorphic_parse",
    "dbt_utils_surrogate_key",
]

SF_DIRS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": os.path.join(REPO, "benchdata", "sf1"),
}


def _time_query(spark, fn, sf_dir: str, runs: int) -> float:
    best = None
    for _ in range(runs):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        elapsed = time.perf_counter() - t0
        best = elapsed if best is None else min(best, elapsed)
        spark.catalog.clearCache()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--only", default="")
    ap.add_argument(
        "--merge",
        action="store_true",
        help="update existing SCALING.json entries instead of replacing the file",
    )
    args = ap.parse_args()
    names = [n for n in args.only.split(",") if n] or SCALE_QUERIES

    if not os.path.isdir(SF_DIRS["sf1"]):
        sys.exit("sf1 missing — run: python tools/gen_scale.py")

    from olist_snowflake_dbt_spark.queries import QUERIES
    from olist_snowflake_dbt_spark.session import get_spark
    from olist_snowflake_dbt_spark.sources.readers import TESTDATA_TABLES, read_table

    spark = get_spark("scale_bench")
    spark.range(1).count()
    for sf_dir in SF_DIRS.values():
        for t in TESTDATA_TABLES:
            try:
                read_table(spark, sf_dir, t).limit(1).count()
            except Exception:
                pass

    out: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name]
        row: dict[str, float] = {}
        for sf, sf_dir in SF_DIRS.items():
            try:
                row[sf] = round(_time_query(spark, fn, sf_dir, args.runs), 3)
            except Exception as exc:
                row[f"{sf}_error"] = f"{type(exc).__name__}: {exc}"[:200]
                print(f"{name} @ {sf} FAILED: {row[f'{sf}_error']}", file=sys.stderr)
        if "sf0.1" in row and "sf1" in row:
            row["ratio"] = round(row["sf1"] / row["sf0.1"], 2)
        out[name] = row
        print(name, row, flush=True)

    scaling_path = os.path.join(REPO, "SCALING.json")
    if args.merge and os.path.exists(scaling_path):
        with open(scaling_path) as fh:
            prior = json.load(fh).get("queries", {})
        prior.update(out)
        out = prior
    result = {
        "data_ratio": 10,
        "runs_per_point": args.runs,
        "queries": out,
        "note": (
            "min-of-N wall seconds per scale factor in one shared session; "
            "fixed per-query overhead (plan, Python worker, checkpoint "
            "setup) does not scale with data, so linear operators show "
            "ratio << 10. Adjudication of outliers: SCALE.md §measured."
        ),
    }
    with open(os.path.join(REPO, "SCALING.json"), "w") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)
    print(json.dumps({k: v.get("ratio") for k, v in out.items()}))


if __name__ == "__main__":
    main()
