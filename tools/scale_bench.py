"""Scale-proof lane (VERDICT r06 #1): measure the sf0.1 -> sf1 scaling
ratio of the most expensive operators and publish it, converting the
100-TB design claims from plan-shape arguments into a measured curve.

Runs each query min-of-N at BOTH scale factors inside one session
(shared JVM/codegen warmup, per-query cache/GC hygiene identical to
bench.py), then writes SCALING.json:

    {"data_ratio": 10, "queries": {name: {"sf0.1": s, "sf1": s,
     "ratio": r, "sf0.1_shuffle_mb": m, "sf1_shuffle_mb": m,
     "bytes_ratio": r}}, ...}

Reading the ratios: the data grows 10x, so a perfectly linear operator
with zero fixed cost shows ratio 10; every query carries 0.3-2 s of
fixed session/plan/Python-worker setup that does NOT grow, so healthy
ratios land well under 10. A ratio >> 10 means super-linear work —
each one must carry a named cause or a fix (SCALE.md records the
adjudication).

Shuffle-bytes lane (VERDICT r08 #3): alongside wall seconds, each
query records the SHUFFLE WRITE bytes its first run moved (delta of
the executor-cumulative counters around the run — monotonic, immune
to stage-store eviction) plus disk/memory spill. "Bytes moved grows
linearly" is the 100-TB claim in its own units: ``bytes_ratio`` ≈ 10
is a linear exchange, << 10 means the exchange carries something
sub-linear (sketches, capped candidates, dimension tables), and > 10
is super-linear data movement — adjudicated in SCALE.md even when
fixed overhead hides it from the wall ratio.

By default the lane covers EVERY registered query (full-catalog
coverage, VERDICT r08 #5); SCALE_QUERIES below keeps the curated
scale-critical core with its per-family rationale, and --core limits
a run to it.

Usage: python tools/scale_bench.py [--runs 2] [--only q1,q2,...] [--core]
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

# second decade (VERDICT r10 #4): sf10 = 100x sf0.1 via gen_scale.py
# --replicas 100. A 10x lane can hide an n*sqrt(n) term that 100x
# exposes; --sf10 adds the third point and ratio_d2 = sf10/sf1.
SF10_DIR = os.path.join(REPO, "benchdata", "sf10")

# the heaviest lanes — the designated two-decade set (round 12 added
# the rewritten prefix filter and the incremental minhash admission;
# both carry adjudicated broadcast->shuffle transitions in SCALE.md)
DECADE2_QUERIES = [
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "similarity_ann_lsh",
    "dedup_connected_components",
    "match_recognize_funnel",
    "web_corpus_prep",
    "dedup_jaccard_prefix_filter",
    "dedup_incremental_minhash",
]


def _bytes_snapshot(spark) -> tuple[int, int, int]:
    """(shuffle_write, disk_spill, mem_spill) cumulative totals.

    Shuffle write comes from the executor-level counters (monotonic for
    the JVM's lifetime — per-query deltas survive stage-store eviction,
    unlike summing the stage list). Spill only exists per-stage, so it
    uses the stage store (best effort: a run long enough to evict its
    own stages would undercount; lane queries are seconds, retention is
    1000 stages)."""
    store = spark._jsc.sc().statusStore()
    sw = 0
    ex = store.executorList(False)
    for i in range(ex.size()):
        sw += ex.apply(i).totalShuffleWrite()
    disk = mem = 0
    try:
        jvm = spark.sparkContext._jvm
        args = [jvm.java.util.ArrayList()] + [
            getattr(store, f"stageList$default${j}")() for j in range(2, 6)
        ]
        st = store.stageList(*args)
        for i in range(st.size()):
            s = st.apply(i)
            disk += s.diskBytesSpilled()
            mem += s.memoryBytesSpilled()
    except Exception:
        pass
    return sw, disk, mem


def _time_query(spark, fn, sf_dir: str, runs: int) -> tuple[float, dict]:
    best = None
    metrics: dict[str, float] = {}
    for r in range(runs):
        if r == 0:
            before = _bytes_snapshot(spark)
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        elapsed = time.perf_counter() - t0
        if r == 0:
            after = _bytes_snapshot(spark)
            mb = 1024.0 * 1024.0
            metrics = {
                "shuffle_mb": round((after[0] - before[0]) / mb, 2),
                "spill_disk_mb": round((after[1] - before[1]) / mb, 2),
                "spill_mem_mb": round((after[2] - before[2]) / mb, 2),
            }
        best = elapsed if best is None else min(best, elapsed)
        spark.catalog.clearCache()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
    return best, metrics


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--only", default="")
    ap.add_argument(
        "--merge",
        action="store_true",
        help="update existing SCALING.json entries instead of replacing the file",
    )
    ap.add_argument(
        "--core",
        action="store_true",
        help="limit to the curated SCALE_QUERIES core (default: full catalog)",
    )
    ap.add_argument(
        "--sf10",
        action="store_true",
        help="two-decade mode: also run at sf10 (DECADE2_QUERIES by "
        "default) and record ratio_d2 = sf10/sf1",
    )
    ap.add_argument(
        "--forced-smj",
        action="store_true",
        help="round-13 pin for the >10x d2 byte-ratio adjudications: "
        "disable broadcast joins (static + AQE thresholds = -1) so BOTH "
        "decades run sort-merge, and record the clean bytes_ratio_d2 "
        "under a nested 'forced_smj' key (merge-only; never clobbers "
        "the default-plan numbers)",
    )
    args = ap.parse_args()
    from olist_snowflake_dbt_spark.queries import QUERIES as _ALL

    names = [n for n in args.only.split(",") if n] or (
        DECADE2_QUERIES if args.sf10
        else SCALE_QUERIES if args.core
        # full catalog: curated core first (canonical ordering for
        # round-over-round diffs), then every remaining registered query
        else SCALE_QUERIES + [q for q in _ALL if q not in SCALE_QUERIES]
    )

    sf_dirs = dict(SF_DIRS)
    if args.sf10:
        if not os.path.isdir(SF10_DIR):
            sys.exit(
                "sf10 missing — run: python tools/gen_scale.py "
                "benchdata/sf10 --replicas 100"
            )
        sf_dirs["sf10"] = SF10_DIR

    if not os.path.isdir(SF_DIRS["sf1"]):
        sys.exit("sf1 missing — run: python tools/gen_scale.py")

    from olist_snowflake_dbt_spark.queries import QUERIES
    from olist_snowflake_dbt_spark.session import get_spark
    from olist_snowflake_dbt_spark.sources.readers import TESTDATA_TABLES, read_table

    spark = get_spark("scale_bench")
    if args.forced_smj:
        # both knobs: the static planner threshold AND the AQE runtime
        # re-plan threshold — either alone still lets a broadcast in
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.range(1).count()
    for sf_dir in sf_dirs.values():
        for t in TESTDATA_TABLES:
            try:
                read_table(spark, sf_dir, t).limit(1).count()
            except Exception:
                pass

    out: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name]
        row: dict[str, float] = {}
        for sf, sf_dir in sf_dirs.items():
            try:
                best, metrics = _time_query(spark, fn, sf_dir, args.runs)
                row[sf] = round(best, 3)
                row[f"{sf}_shuffle_mb"] = metrics.get("shuffle_mb", 0.0)
                for k in ("spill_disk_mb", "spill_mem_mb"):
                    if metrics.get(k):  # spill is rare — record only hits
                        row[f"{sf}_{k}"] = metrics[k]
            except Exception as exc:
                row[f"{sf}_error"] = f"{type(exc).__name__}: {exc}"[:200]
                print(f"{name} @ {sf} FAILED: {row[f'{sf}_error']}", file=sys.stderr)
        if "sf0.1" in row and "sf1" in row:
            row["ratio"] = round(row["sf1"] / row["sf0.1"], 2)
            # bytes moved through exchanges, sf1 vs sf0.1: ~10 = linear
            # shuffle, <<10 = sub-linear (sketch/capped/broadcast), >10 =
            # super-linear data movement (adjudicate in SCALE.md)
            if row.get("sf0.1_shuffle_mb", 0) >= 0.5:
                row["bytes_ratio"] = round(
                    row["sf1_shuffle_mb"] / row["sf0.1_shuffle_mb"], 2
                )
        if "sf1" in row and "sf10" in row:
            # second decade: at sf1 the fixed session overhead is mostly
            # amortized, so ratio_d2 reads closer to the true exponent
            row["ratio_d2"] = round(row["sf10"] / row["sf1"], 2)
            if row.get("sf1_shuffle_mb", 0) >= 0.5:
                row["bytes_ratio_d2"] = round(
                    row["sf10_shuffle_mb"] / row["sf1_shuffle_mb"], 2
                )
        out[name] = row
        print(name, row, flush=True)

    scaling_path = os.path.join(REPO, "SCALING.json")
    if args.forced_smj:
        # nest under forced_smj so the default-plan lane stays intact
        if not os.path.exists(scaling_path):
            sys.exit("--forced-smj requires an existing SCALING.json")
        with open(scaling_path) as fh:
            prior = json.load(fh).get("queries", {})
        for name, row in out.items():
            prior.setdefault(name, {})["forced_smj"] = row
        out = prior
    elif args.merge and os.path.exists(scaling_path):
        with open(scaling_path) as fh:
            prior = json.load(fh).get("queries", {})
        # per-query merge that PRESERVES nested lanes (forced_smj,
        # standing_growth, zipf, ...) — a flat update() would clobber
        # them with the fresh flat row
        for name, row in out.items():
            base = prior.get(name, {})
            nested = {k: v for k, v in base.items() if isinstance(v, dict)}
            prior[name] = {**row, **nested}
        out = prior
    result = {
        "data_ratio": 10,
        "runs_per_point": args.runs,
        "queries": out,
        "note": (
            "min-of-N wall seconds per scale factor in one shared session; "
            "fixed per-query overhead (plan, Python worker, checkpoint "
            "setup) does not scale with data, so linear operators show "
            "ratio << 10. *_shuffle_mb = shuffle-write bytes moved by the "
            "first run (executor-counter delta); bytes_ratio ~10 = linear "
            "exchange, <<10 = sub-linear payload (sketch/cap/broadcast), "
            ">10 = super-linear movement. Adjudication of outliers: "
            "SCALE.md §measured."
        ),
    }
    with open(os.path.join(REPO, "SCALING.json"), "w") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)
    print(json.dumps({k: v.get("ratio") for k, v in out.items()}))


if __name__ == "__main__":
    main()
