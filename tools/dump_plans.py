"""Dump `.explain("formatted")` plans of flagship queries to
docs/PLANS.md — the physical-plan evidence (pushdown, pruning,
broadcast, codegen spans, no cartesians) that the scale design claims
rest on. Regenerate after plan-affecting changes:

    python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FLAGSHIPS = [
    ("fct_orders", "Reference pipeline: staging fused into the mart build; "
     "both dim joins broadcast; decimal sums partial-aggregated map-side."),
    ("tpch_q12_shipmode_priority", "Fact-fact orderkey join: the date "
     "window pushes into the lineitem scan (3-column ReadSchema), both "
     "conditional counts come out of ONE two-phase aggregate; AQE picks "
     "broadcast at test scale and sort-merge at cluster scale."),
    ("dedup_semantic", "SemDeDup cluster-then-prune: broadcast-centroid "
     "k-means assignment persisted once, cosine pairs confined to "
     "within-cluster equi-joins, keep-min anti-join on ids. Round 12: "
     "the probe-side block repartition is ADAPTIVE — this probe "
     "arrives 32-wide from the upstream repartition, so no "
     "REPARTITION_BY_COL exchange appears here (a narrow raw-scan "
     "probe still gets one)."),
    ("sample_weighted_percentile", "Two-level exact weighted percentiles "
     "(round 11): per-group range buckets; the bucket-prefix frame is "
     "tiny and BROADCASTS back; the row-level running weight windows "
     "per (group, bucket) — parallelism independent of group count."),
    ("dedup_jaccard_prefix_filter", "Exact Jaccard via prefix filtering "
     "(round 12 shape): the FLAT (id, n, shingle) index is the only "
     "persist — the shingle HOF is evaluated once behind the Generate, "
     "never inlined into a pushed-down filter; candidates carry the "
     "lossless length filter inside the self-join condition; the "
     "verify is a flat count join, no array columns through any "
     "exchange."),
    ("web_cap_prefilter", "Per-host cap with the hot-host prefilter: "
     "per-host counts persist once (dim-sized) and broadcast into a "
     "map-side threshold filter; the rank window sees ~factor*cap "
     "rows per host whatever the host size; the under-delivery "
     "verifier is a broadcast-sized left join."),
    ("dedup_minhash_lsh", "Signatures via codegen'd min-aggregates. "
     "Round-11 reshape: band keys explode into a slim (band, id) frame "
     "— signatures NEVER ride the band exchanges; hot buckets drop via "
     "broadcast LEFT ANTI against the bounded over-cap list; pairs "
     "dedup as 16-byte id rows; signatures attach by two id-keyed "
     "joins. No cartesian anywhere."),
    ("similarity_ann_lsh", "Hyperplane signatures bound per row; band join "
     "+ re-rank with precomputed norms."),
    ("range_join_bucketed", "Range predicate rides the equi-key hash join "
     "as a residual filter — not a nested-loop join."),
    ("salted_skew_join", "Join key carries the salt: the hot key spreads "
     "across reducers."),
    ("asof_last_purchase", "As-of join as window-over-union — one shuffle."),
    ("two_phase_distinct_skew", "Distinct on (group, value) splits the hot "
     "group before the per-group count."),
    ("dedup_winnowing", "Winnowed fingerprints: ONE window shuffle on the "
     "doc id (bounded ROWS frame min), then an inverted-index join over "
     "the ~2/(w+1)-density subset."),
    ("similarity_quantized_topk", "Int8-quantized corpus side: integer "
     "norms precomputed per row, queries broadcast; 4x fewer vector bytes "
     "through the scan. The BroadcastNestedLoopJoin(Cross, BuildLeft) here "
     "is the INTENDED plan — a deliberate broadcast(small queries) x "
     "partitioned-corpus score-all, the brute-force ANN pattern; the "
     "banded/bucketed paths (ann_lsh/ivf) are the sub-linear variants."),
    ("text_decontaminate", "Benchmark side broadcasts (eval suites are "
     "tiny vs the corpus): the training scan streams past a hashed "
     "eval-set with NO corpus shuffle before the per-doc aggregate."),
    ("text_tfidf_topk", "Explode map-side; tf aggregates once on "
     "(doc, term); doc_freq re-aggregates on term with map-side partial "
     "combine, and the tf-docfreq join is AQE-skew-splittable on hot "
     "stop-words (a term-partition window would serialize them through "
     "one reducer); corpus size joins as a broadcast 1-row scalar; "
     "top-k via WindowGroupLimit rank pushdown."),
    ("bm25_topk", "Inverted-index retrieval: tf aggregates once on "
     "(doc, term) with map-side combine; broadcast query terms select "
     "only their postings; df/avgdl ride broadcast scalars; per-term "
     "nano scores integer-sum per (query, doc); top-k via window rank "
     "pushdown. Nothing downstream of the probe touches the corpus."),
    ("timetravel_changes", "CHANGES between table generations: one "
     "full-outer hash join on the key comparing 8-byte xxhash64 row "
     "fingerprints (fingerprints, not rows, through the exchange); "
     "unchanged keys filtered BEFORE the DELETE/INSERT union fan-out."),
    ("governance_row_access", "Row access policy: the session role's "
     "grants filter FIRST, broadcast into a LEFT SEMI join against the "
     "fact scan — enforcement is map-side; no fact shuffle."),
    ("funnel_conversion", "Ordered funnel: both running MINs and the "
     "per-user aggregate share one (user_id) exchange + sort — "
     "sequence detection in a single sorted pass per user."),
    ("timetravel_ivm_refresh", "Incremental view maintenance: the "
     "CHANGES delta aggregates with map-side-combinable signed sums, "
     "then ONE full-outer join on the group key advances the standing "
     "aggregate — cost O(churned groups), never the base table."),
    ("corpus_prep_pipeline", "The end-to-end corpus prep chain as ONE "
     "declarative plan: quality filter pushes into the scans feeding "
     "both the shingle and packing branches, the benchmark side "
     "broadcasts, the anti-join drops contaminated docs, and packing "
     "is a sharded running-sum window."),
    ("geo_grid_epsilon_join", "Spatial eps-join: 3x3 stencil explode, "
     "equi-join on the cell key, integer dist2 refine inside codegen — "
     "no cartesian at any scale."),
    ("interval_overlap_pairs", "Interval overlap via bin blocking: "
     "bounded sequence-explode, (custkey, bin) equi-join, "
     "single-emission filter — no inequality-join fallback."),
    ("bitmap_ndv_rollup", "Exact mergeable NDV: bit_or partials combine "
     "map-side; words through the exchange bounded by the id domain."),
    ("chat_turn_stats", "Dialogue validation: gap flag, session number "
     "and turn flag share ONE key-partitioned window sort; the "
     "per-session aggregate is map-side combinable."),
    ("tpch_q3_priority_revenue", "Star join: filtered customer dim "
     "broadcasts, date filters push into both fact scans, top-10 is "
     "TakeOrderedAndProject (per-partition top-k, driver merge — no "
     "global sort shuffle)."),
    ("tpch_q5_region_volume", "6-table snowflake: region/nation collapse "
     "to a broadcast filter, supplier and customer broadcast; lineitem "
     "is never shuffled for a join — only the final 5-group aggregate "
     "exchanges (map-side partials first)."),
    ("asof_click_attribution", "Two-table as-of join as tagged "
     "union-then-window: ONE shuffle on user_id replaces the quadratic "
     "range-join + argmax formulation."),
    ("text_corpus_freq_score", "Unigram vocab aggregates once, then "
     "broadcasts into the held-out explode — the corpus side never "
     "shuffles on the word key (Zipf caps vocab size, not corpus size)."),
    ("tpch_q8_market_share", "8-table snowflake: every dimension "
     "(part/supplier/customer/nation x2/region) broadcasts pre-filtered; "
     "lineitem exchanges once, for the per-year conditional-aggregate "
     "ratio (exact-decimal numerator/denominator)."),
    ("tpch_q21_waiting_suppliers", "EXISTS + NOT EXISTS against the same "
     "fact: LEFT SEMI then LEFT ANTI self-joins, both equi-keyed on "
     "l_orderkey with the supplier/date terms as residuals — never a "
     "cartesian; the nation filter broadcasts through supplier first."),
    ("dedup_subdoc_chunks", "Sub-document dedup: chunk explode feeds an "
     "xxhash64-keyed winner aggregate (8-byte shuffle payload, map-side "
     "partials), keep-first via integer min — then one per-doc recount."),
    ("hll_and_quantile_sketch", "Sketches and COUNT(DISTINCT) in "
     "SEPARATE aggregation passes joined on the 3-row key: fusing them "
     "demotes the ObjectHashAggregate to a per-row SortAggregate under "
     "the distinct Expand (measured 62s vs 5s). Exact percentiles come "
     "from a value-counts distribution, not a value-buffering UDAF."),
    ("similarity_pq_adc", "Product quantization + ADC: codebook and "
     "per-query distance tables are broadcast (two "
     "BroadcastHashJoins); the encode argmin is a per-(vector,subspace) "
     "window over the broadcast-joined distances; ADC is one "
     "partially-aggregated bigint sum per (query, candidate) — the "
     "corpus never shuffles except the final (query,candidate) "
     "aggregate of 4 small ints per vector."),
    ("governance_erasure_cascade", "Right-to-be-forgotten: the erasure "
     "batch broadcasts into every referencing table — LEFT ANTI for "
     "delete, LEFT OUTER + conditional projection for pseudonymize, "
     "LEFT SEMI for the residual audit; no standing-table shuffle "
     "anywhere in the cascade."),
    ("er_golden_records", "Entity resolution: candidates meet in ONE "
     "equi-join on the block key with the length band and thresholded "
     "levenshtein as residuals (never a cartesian); min-label CC joins "
     "per round on the node id; survivorship is a single "
     "map-side-combinable struct-min/max aggregate per entity."),
    ("web_host_url_stats", "URL canonicalization is a map-only codegen "
     "projection (no UDF, no regex backtracking); the ONLY exchange is "
     "the final host-keyed hash aggregate with map-side partials — the "
     "crawl never shuffles for canonicalization itself."),
    ("retrieval_mmr_rerank", "MMR: brute-force candidate stage is the "
     "documented broadcast(queries)-vs-corpus baseline; pair sims "
     "equi-join on query_id over the capped candidate set (N^2 bounded "
     "by the cap); the greedy runs in ONE cogrouped Arrow exchange per "
     "side."),
    ("listagg_within_group", "Ordered LISTAGG: sort-struct collect "
     "inside a single hash aggregate — one exchange on the group key, "
     "no window, no global sort."),
    ("incremental_merge_update_columns", "Partial-update MERGE: "
     "survivors (anti), matched rebuild (inner), and inserts (anti) all "
     "hash-join on the SAME unique-key partitioning; the batch ships "
     "only key + update columns into the matched rebuild."),
    ("match_recognize_funnel", "Row-pattern matching: DEFINE "
     "classification is a codegen'd bitmask projection feeding ONE "
     "user_id exchange into a FlatMapGroupsInPandas NFA kernel — the "
     "sessionization shape; measure columns ride the same projection."),
    ("tokenizer_bpe_segment", "BPE train + encode: the corpus scans "
     "once into the vocab aggregate; the encode leg is one map-only "
     "projection whose 8 learned merges compile to nested literal "
     "replaces inside WholeStageCodegen — no Python, no extra "
     "exchange."),
    ("window_conditional_events", "Snowflake conditional-event trio: "
     "lag flag, both running SUMs and the partition total share ONE "
     "user_id Exchange + sort."),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from olist_snowflake_dbt_spark.session import get_spark
    from olist_snowflake_dbt_spark.queries import QUERIES

    spark = get_spark("plans")
    out = io.StringIO()
    out.write(
        "# PLANS — physical plans of flagship queries\n\n"
        f"Generated by `python tools/dump_plans.py {sf_dir}` "
        "(regenerate after plan-affecting changes).\n\n"
        "What to look for: `PushedFilters`/`ReadSchema` on every parquet "
        "scan (pushdown + pruning), `BroadcastHashJoin` for small dims, "
        "`WholeStageCodegen` spans over the hot expressions, and the "
        "ABSENCE of `CartesianProduct`/`BroadcastNestedLoopJoin` — except "
        "where a broadcast cross join IS the documented plan (brute-force "
        "scoring of a small broadcast query set against the partitioned "
        "corpus).\n"
    )
    for name, note in FLAGSHIPS:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out.write(f"\n## {name}\n\n{note}\n\n```\n{plan}```\n")
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "docs", "PLANS.md")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(out.getvalue())
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
