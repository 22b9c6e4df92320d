"""Driver queries: deterministic sampling/splitting (operators/sampling)
and the applyInPandas grouped-map surface (operators/similarity).

The md5-prefix rule is fully portable, so every sampling query has an
exact DuckDB twin — the oracle hardcodes the hex boundaries that
``operators.sampling._boundary`` derives (0.8→cccccccc, 0.9→e6666666,
0.1→19999999); a drift in the boundary math breaks the hash match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import sampling as SMP
from .operators import similarity as SIM
from .queries import _t, query

_H = "substr(md5(CAST({c} AS VARCHAR)), 1, 8)"


@query(
    "sample_hash_split",
    f"""
    SELECT split, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM (
        SELECT CASE WHEN {_H.format(c='doc_id')} < 'cccccccc' THEN 'train'
                    WHEN {_H.format(c='doc_id')} < 'e6666666' THEN 'val'
                    ELSE 'test' END AS split,
               n_chars
        FROM documents
    )
    GROUP BY split
    """,
)
def q_sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test by md5(doc_id) prefix: stable under
    re-runs, re-shards, engines, and corpus growth — the reproducible
    alternative to rand()-splits for training corpora."""
    docs = _t(spark, sf_dir, "documents")
    out = SMP.hash_split(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    return out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("sum_chars")
    )


@query(
    "sample_hash_fraction",
    f"""
    SELECT COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
                AS DOUBLE) AS sum_total
    FROM orders
    WHERE {_H.format(c='o_orderkey')} < '19999999'
    """,
)
def q_sample_hash_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% subset of orders — a pure filter (no shuffle,
    no rand()); the same ids are sampled on every engine."""
    out = SMP.hash_sample(_t(spark, sf_dir, "orders"), "o_orderkey", 0.1)
    return out.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .cast("double")
        .alias("sum_total"),
    )


@query(
    "sample_stratified_topn",
    f"""
    SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY {_H.format(c='doc_id')}, doc_id
               ) AS rk
        FROM documents
    ) WHERE rk <= 25
    """,
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 25 documents per language, hash-ranked — balanced class
    subsets without a collect; one window shuffle on the stratum key."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return SMP.stratified_topn(docs, "lang", "doc_id", 25)


@query(
    "pandas_group_vector_sums",
    """
    SELECT label, idx AS dim_idx,
           CAST(CAST(SUM(CAST(CAST(x AS VARCHAR) AS DECIMAL(28,15))) AS DECIMAL(38,15))
                AS VARCHAR) AS dim_sum,
           COUNT(*) AS n_vecs
    FROM (
        SELECT label,
               UNNEST(embedding) AS x,
               UNNEST(generate_series(1, len(embedding))) AS idx
        FROM embeddings
    )
    GROUP BY label, idx
    """,
)
def q_pandas_group_vector_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map Pandas UDF (applyInPandas) computing per-label
    elementwise embedding sums in exact decimal — proves the Arrow
    decimal128 lane end-to-end against a pure-SQL oracle. The final
    DECIMAL(38,15) is rendered as VARCHAR on both sides: a DOUBLE cast
    would drop sub-ulp digits, and DuckDB's pandas path would otherwise
    collapse it to float64 while Spark keeps Decimal (driver repr)."""
    sums = SIM.group_vector_sums(
        _t(spark, sf_dir, "embeddings"), "embedding", "label", 64
    )
    return sums.withColumn("dim_sum", F.col("dim_sum").cast("string"))


@query(
    "sample_mix_sources",
    f"""
    SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    WHERE (source = 'src0' AND {_H.format(c='doc_id')} < 'gggggggg')
       OR (source = 'src1' AND {_H.format(c='doc_id')} < '80000000')
       OR (source = 'src2' AND {_H.format(c='doc_id')} < '40000000')
       OR (source = 'src3' AND {_H.format(c='doc_id')} < '19999999')
    GROUP BY source
    """,
)
def q_sample_mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixing (operators/sampling.mix_sources): per-source keep
    rates 1.0/0.5/0.25/0.1, all other sources dropped — a pure filter,
    zero shuffle before the audit aggregate."""
    docs = _t(spark, sf_dir, "documents")
    out = SMP.mix_sources(
        docs, "source", "doc_id",
        {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.1},
    )
    return out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("sum_chars")
    )


@query(
    "sample_pack_sequences",
    """
    SELECT doc_id, source,
           CAST(doc_id % 8 AS INTEGER) AS shard,
           CAST(SUM(n_chars) OVER w - n_chars AS BIGINT) AS seq_start,
           CAST((SUM(n_chars) OVER w - n_chars) // 4096 AS BIGINT) AS pack_id
    FROM documents
    WINDOW w AS (PARTITION BY source, doc_id % 8 ORDER BY doc_id
                 ROWS UNBOUNDED PRECEDING)
    """,
)
def q_sample_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (operators/sampling.pack_sequences): running
    char-offset within (source, shard), pack = offset div 4096; the
    shard key bounds every window partition so no source serializes
    into one reducer."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    out = SMP.pack_sequences(docs, "doc_id", "n_chars", 4096, "source", 8)
    return out.select("doc_id", "source", "shard", "seq_start", "pack_id")


@query(
    "cogroup_conversion_stats",
    """
    WITH c AS (
        SELECT user_id, ts FROM events WHERE event_type = 'click'
    ),
    p AS (
        SELECT user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    ca AS (SELECT user_id, COUNT(*) AS n_clicks FROM c GROUP BY 1),
    pa AS (
        SELECT user_id, COUNT(*) AS n_purchases, MIN(ts) AS first_purchase_ts
        FROM p GROUP BY 1
    ),
    cb AS (
        SELECT c.user_id, COUNT(*) AS clicks_before
        FROM c JOIN pa ON c.user_id = pa.user_id
                      AND c.ts <= pa.first_purchase_ts
        GROUP BY 1
    )
    SELECT COALESCE(ca.user_id, pa.user_id) AS user_id,
           CAST(COALESCE(ca.n_clicks, 0) AS BIGINT) AS n_clicks,
           CAST(COALESCE(pa.n_purchases, 0) AS BIGINT) AS n_purchases,
           pa.first_purchase_ts,
           CAST(COALESCE(cb.clicks_before, 0) AS BIGINT)
               AS clicks_before_first_purchase
    FROM ca
    FULL OUTER JOIN pa ON ca.user_id = pa.user_id
    LEFT JOIN cb ON COALESCE(ca.user_id, pa.user_id) = cb.user_id
    """,
)
def q_cogroup_conversion_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-grouped Pandas surface (operators/similarity.
    cogrouped_conversion_stats): clicks and purchases cogrouped per
    user into one Arrow kernel computing the conversion funnel — the
    DuckDB twin re-derives it with FULL OUTER aggregates + an
    attribution-window join."""
    from .operators.similarity import cogrouped_conversion_stats

    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts"
    )
    # num_partitions auto-sizes from the approx key count per the
    # operator's cost model (~1.5k keys at sf0.1 → 8 partitions, the
    # measured sweet spot); pass an explicit value on a real cluster
    return cogrouped_conversion_stats(clicks, purchases)


@query(
    "sample_reservoir_per_group",
    f"""
    WITH ranked AS (
        SELECT source, doc_id, n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5('r8|' || CAST(doc_id AS VARCHAR)) ASC,
                            doc_id ASC) AS rk
        FROM documents
    )
    SELECT source, doc_id, n_chars FROM ranked WHERE rk <= 7
    """,
)
def q_sample_reservoir_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group deterministic reservoir (operators/sampling.
    reservoir_per_group): exactly 7 docs per source chosen by salted
    md5-hash rank — reproducible across runs/engines/shards, uniform by
    hash mixing, rotatable via the salt, and stable under corpus growth
    (a new doc displaces at most one incumbent). One hash-partition by
    group + a top-n window."""
    docs = _t(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    return SMP.reservoir_per_group(docs, "source", "doc_id", 7, salt="r8")


@query(
    "sample_mixture_weights",
    """
    WITH counts AS (
        SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1
    ),
    q AS (
        SELECT source, n_docs,
               CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000000) AS BIGINT)
                   AS sqrt_scaled
        FROM counts
    ),
    tot AS (SELECT CAST(SUM(sqrt_scaled) AS BIGINT) AS t FROM q),
    mx AS (
        SELECT sqrt_scaled AS ms, n_docs AS md
        FROM q ORDER BY CAST(sqrt_scaled AS DOUBLE) / n_docs DESC,
                        sqrt_scaled DESC, n_docs DESC
        LIMIT 1
    )
    SELECT q.source, q.n_docs, q.sqrt_scaled,
           CAST(q.sqrt_scaled AS DOUBLE) / tot.t AS weight,
           (CAST(q.sqrt_scaled AS DOUBLE) * mx.md)
               / (CAST(mx.ms AS DOUBLE) * q.n_docs) AS rate_vs_max
    FROM q CROSS JOIN tot CROSS JOIN mx
    """,
)
def q_sample_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened source mixture at tau=2 (operators/sampling.
    mixture_weights, the DoReMi-style data-mixing prep): rare sources
    up-weighted by w_g proportional to sqrt(p_g), with the per-source
    acceptance rate normalized to the most down-sampled source. sqrt is
    the one IEEE-exact root, and all shares are ratios of pre-quantized
    integers, so the mixture table is bit-identical across engines. Two
    broadcast scalars over the per-source counts — the corpus scans
    once."""
    docs = _t(spark, sf_dir, "documents").select("source")
    return SMP.mixture_weights(docs, "source")


@query(
    "sample_chunk_windows",
    """
    WITH w AS (
        SELECT doc_id,
               string_split_regex(
                   trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')),
                   ' ') AS wl
        FROM documents WHERE doc_id % 5 = 0
    ),
    wn AS (SELECT doc_id, list_filter(wl, x -> x <> '') AS wl FROM w),
    st AS (
        SELECT doc_id, wl,
               CASE WHEN len(wl) <= 32 THEN [0]
                    ELSE list_transform(
                        generate_series(0, len(wl) - 32, 16), x -> x)
               END AS starts
        FROM wn
    ),
    ex AS (
        SELECT doc_id, wl,
               generate_subscripts(starts, 1) - 1 AS chunk_idx,
               UNNEST(starts) AS chunk_start
        FROM st
    )
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           CAST(chunk_start AS INT) AS chunk_start,
           CAST(len(wl[chunk_start + 1 : chunk_start + 32]) AS INT)
               AS chunk_len,
           array_to_string(wl[chunk_start + 1 : chunk_start + 32], ' ')
               AS chunk_text
    FROM ex
    """,
)
def q_sample_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking into training samples (operators/sampling.
    chunk_windows): 32-token windows at stride 16 (50% overlap, the HF
    return_overflowing_tokens layout); short docs yield one short chunk.
    Entirely codegen — word array built once, offsets from sequence(),
    chunks by slice() — with explode as the only (map-side) fan-out; no
    shuffle at all."""
    from .functions.text import words

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 5 == 0)
        .select("doc_id", "text")
    )
    return SMP.chunk_windows(docs, "doc_id", words("text"), window=32, stride=16)


_HOLDOUT_B = "2024-01-24 00:00:00"
_HOLDOUT_ORACLE = f"""
WITH test_groups AS (
    SELECT DISTINCT user_id FROM events
    WHERE ts >= TIMESTAMP '{_HOLDOUT_B}'
),
labeled AS (
    SELECT e.event_type, e.value,
           CASE WHEN e.ts >= TIMESTAMP '{_HOLDOUT_B}' THEN 'test'
                WHEN e.user_id IN (SELECT user_id FROM test_groups)
                    THEN 'leaked'
                ELSE 'train' END AS split
    FROM events e
)
SELECT split, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6))
            AS DOUBLE) AS sum_value
FROM labeled
GROUP BY 1, 2
"""


@query("sample_time_holdout", _HOLDOUT_ORACLE)
def q_sample_time_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware temporal holdout (operators/sampling.
    temporal_holdout): events split at a time boundary with the
    group-leakage guard on — pre-boundary rows of users who also appear
    in the test window land in a 'leaked' quarantine bucket instead of
    train, so a per-user model's eval set stays unseen. The oracle
    replays the three-way labeling; decimal value sums keep the compare
    exact. The corpus never shuffles: the test-window user set is
    broadcast and the boundary predicate rides the scan."""
    ev = _t(spark, sf_dir, "events")
    out = SMP.temporal_holdout(ev, "ts", _HOLDOUT_B, group_col="user_id")
    return out.groupBy("split", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("decimal(38,6)")
        .cast("double")
        .alias("sum_value"),
    )


_NEGSAMPLE_ORACLE = """
WITH anchors AS (
    SELECT doc_id AS anchor_id FROM documents WHERE doc_id < 100
),
pool AS (
    SELECT doc_id AS neg_id,
           CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                AS BIGINT) % 32 AS b
    FROM documents
),
slots AS (
    SELECT anchor_id, i.slot,
           CAST('0x' || substr(md5(CAST(anchor_id AS VARCHAR) || '|'
                || CAST(i.slot AS VARCHAR)), 1, 15) AS BIGINT) % 32 AS b
    FROM anchors, (SELECT UNNEST([0, 1, 2, 3]) AS slot) i
),
cand AS (
    SELECT s.anchor_id, s.slot, p.neg_id
    FROM slots s JOIN pool p ON s.b = p.b
    WHERE NOT (p.neg_id = s.anchor_id)
)
SELECT anchor_id, slot,
       min_by(neg_id,
              CAST('0x' || substr(md5(CAST(anchor_id AS VARCHAR) || '|'
                   || CAST(slot AS VARCHAR) || '|'
                   || CAST(neg_id AS VARCHAR)), 1, 15) AS BIGINT))
           AS neg_id
FROM cand GROUP BY anchor_id, slot
"""


@query("sample_negatives_contrastive", _NEGSAMPLE_ORACLE)
def q_sample_negatives_contrastive(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Deterministic negative sampling for contrastive training pairs
    (operators/sampling.negative_samples): 4 pseudo-random non-self
    documents per anchor via bucket rendezvous — pool hashed into 32
    buckets, each (anchor, slot) targets one bucket, one equi-join +
    one min_by pick; NEVER anchors × pool. Known positives (here the
    identity pairs) are anti-joined out BEFORE the pick. Every hash is
    the engine-portable 60-bit md5, so the oracle replays the exact
    candidate set and the exact winner of every slot."""
    from .operators.sampling import negative_samples

    docs = _t(spark, sf_dir, "documents")
    anchors = docs.filter(F.col("doc_id") < 100).select(
        F.col("doc_id").alias("anchor_id")
    )
    positives = docs.select(
        F.col("doc_id").alias("anchor_id"), F.col("doc_id")
    )
    return negative_samples(
        anchors,
        docs,
        k=4,
        anchor_id="anchor_id",
        pool_id="doc_id",
        n_buckets=32,
        positives=positives,
    )


_WPCT_ORACLE = """
WITH marked AS (
    SELECT l_returnflag AS rf,
           CAST(l_extendedprice AS DECIMAL(18,2)) AS v,
           SUM(CAST(l_quantity AS BIGINT)) OVER (
               PARTITION BY l_returnflag
               ORDER BY CAST(l_extendedprice AS DECIMAL(18,2)), l_orderkey,
                        l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_w,
           SUM(CAST(l_quantity AS BIGINT)) OVER (
               PARTITION BY l_returnflag) AS tot_w
    FROM lineitem
)
SELECT rf AS l_returnflag,
       CAST(MIN(v) AS VARCHAR) AS weighted_median,
       CAST(MIN(v) FILTER (WHERE cum_w * 10 >= 9 * tot_w) AS VARCHAR)
           AS weighted_p90
FROM marked WHERE cum_w * 2 >= tot_w
GROUP BY rf
"""


@query("sample_weighted_percentile", _WPCT_ORACLE)
def q_sample_weighted_percentile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact weighted median + p90 (operators/sampling.
    weighted_percentile): the smallest price whose running QUANTITY
    weight reaches 1/2 (resp. 9/10) of its return-flag group — the
    statistic importance-weighted corpora need (unweighted medians
    over upsampled rows answer the wrong question). The percentile is
    a rational, so the boundary is one integer cross-multiplication —
    no float threshold can disagree between engines. BOTH percentiles
    come off ONE sorted frame (same-spec window frames fold into one
    Window operator; each percentile is a conditional MIN in the one
    downstream aggregate) — one key exchange, one sort, one data pass,
    the round-11 fuse of the old one-window-per-percentile shape."""
    from .operators.sampling import weighted_percentiles

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("price"),
        F.col("l_quantity"),
        F.col("l_orderkey"),
        F.col("l_linenumber"),
    ).withColumn(
        # numeric composite tiebreak: l_linenumber < 8, so key*8+line
        # orders exactly like (l_orderkey, l_linenumber) without the
        # per-row lpad/concat string the exchange would otherwise carry
        "tb",
        F.col("l_orderkey") * 8 + F.col("l_linenumber"),
    )
    both = weighted_percentiles(
        li,
        ["l_returnflag"],
        "price",
        "l_quantity",
        [("wm", 1, 2), ("wp", 9, 10)],
        tiebreak_col="tb",
        # 3 return-flag groups would otherwise sort the whole table in
        # 3 window tasks — the two-level bucket path is the 100-TB shape
        range_buckets=64,
    )
    return both.select(
        "l_returnflag",
        F.col("wm").cast("string").alias("weighted_median"),
        F.col("wp").cast("string").alias("weighted_p90"),
    )


@query(
    "sample_epoch_shuffle",
    """
    WITH h AS (
        SELECT doc_id, n_chars,
               CAST('0x' || substr(md5('ep1' || CAST(doc_id AS VARCHAR)),
                                   1, 15) AS BIGINT) AS hh
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, n_chars,
               least(CAST(hh // 144115188075855872 AS INT), 7) AS shard,
               ROW_NUMBER() OVER (
                   PARTITION BY least(CAST(hh // 144115188075855872 AS INT), 7)
                   ORDER BY hh, doc_id) AS position
        FROM h
    )
    SELECT shard, doc_id, position
    FROM ranked WHERE position <= 40
    """,
)
def q_sample_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order epoch shuffle
    (operators/sampling.epoch_shuffle): seed-keyed 60-bit portable
    hash cut into 8 contiguous shard bands + within-shard rank —
    (shard, position) is a total global permutation replayed
    bit-for-bit by the oracle (same md5 hash, same integer band
    arithmetic). The head of each shard is compared, which pins both
    the band assignment and the ORDER."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    out = SMP.epoch_shuffle(docs, "doc_id", seed="ep1", shards=8)
    return out.filter(F.col("position") <= 40).select(
        "shard", "doc_id", "position"
    )


_HLB = "CAST('0x' || substr(md5(x), 1, 15) AS BIGINT) % 4096"
_HLW = (
    "(CAST('0x' || substr(md5('quality-v1:' || CAST("
    + _HLB
    + " AS VARCHAR)), 1, 15) AS BIGINT) % 2001) - 1000"
)

_TOKEN_BUDGET_ORACLE = f"""
    WITH wq AS (
        SELECT doc_id,
               list_filter(string_split_regex(trim(regexp_replace(lower(text),
                   '[^a-z0-9]+', ' ', 'g')), ' '), x -> len(x) > 0) AS w
        FROM documents
    ),
    m AS (
        SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
               CAST(COALESCE(list_sum(list_transform(w, x -> {_HLW})), 0)
                    AS BIGINT) AS score
        FROM wq
    ),
    b AS (
        SELECT doc_id, score, n_words,
               (score - ((score % 100) + 100) % 100) // 100 AS bkt
        FROM m
    ),
    pb AS (SELECT bkt, CAST(SUM(n_words) AS BIGINT) AS btok FROM b GROUP BY 1),
    cb AS (
        SELECT bkt, btok,
               CAST(COALESCE(SUM(btok) OVER (ORDER BY bkt DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS cum_before
        FROM pb
    ),
    tot AS (SELECT (SUM(btok) * 3) // 10 AS budget FROM pb),
    flags AS (
        SELECT bkt, cum_before, budget,
               cum_before + btok <= budget AS full_keep,
               cum_before < budget AND cum_before + btok > budget AS boundary
        FROM cb CROSS JOIN tot
    ),
    r AS (
        SELECT b.doc_id, b.score, b.n_words, f.full_keep, f.boundary,
               f.cum_before, f.budget,
               CAST(SUM(b.n_words) OVER (PARTITION BY b.bkt
                   ORDER BY b.score DESC, b.doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS run
        FROM b JOIN flags f USING (bkt)
    )
    SELECT doc_id, score, n_words AS n_tokens,
           full_keep OR (boundary AND cum_before + run <= budget) AS keep
    FROM r
"""


@query("sample_token_budget_select", _TOKEN_BUDGET_ORACLE)
def q_sample_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-constrained selection (operators/sampling.
    token_budget_select): keep the best hashed-linear-score documents
    until 30% of the corpus's tokens are spent — the FineWeb/DCLM-style
    'best N tokens' gate, WITHOUT a global sort: floor-bucketed scores,
    one tiny cumulative window over buckets, and a running sum over
    only the boundary bucket's rows. All-integer; the oracle replays
    the score, the bucket math, both windows, and the truncating
    budget division."""
    from .operators import text as TX

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    scored = TX.hashed_linear_score(docs).select(
        "doc_id", F.col("logit_milli").alias("score_in"), "n_words"
    )
    return SMP.token_budget_select(scored, "score_in", "n_words", "doc_id")


_GLOBAL_RANK_ORACLE = """
    SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(ROW_NUMBER() OVER (ORDER BY n_chars, doc_id)
                AS BIGINT) AS global_rank,
           CAST(NTILE(4) OVER (ORDER BY n_chars, doc_id)
                AS BIGINT) AS phase
    FROM documents
    WHERE n_chars IS NOT NULL
"""


@query("sample_global_rank", _GLOBAL_RANK_ORACLE)
def q_sample_global_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global rank + curriculum phase without a global sort
    (operators/sampling.exact_global_rank): ROW_NUMBER over (n_chars,
    doc_id) decomposed into integer-div floor buckets + one tiny
    bucket-frame window + bucket-parallel row_numbers; phase = SQL
    NTILE(4) via the boundary closed form — the curriculum-training
    primitive. The oracle IS the engine's own single-partition
    ROW_NUMBER + NTILE windows, so the hash match proves the
    decomposition exactly equals the global sort AND native NTILE."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return SMP.exact_global_rank(docs, "n_chars", "doc_id", phases=4)


_UNIMAX_ORACLE = """
    WITH counts AS (
        SELECT source, CAST(SUM(n_chars) AS BIGINT) AS n_tokens
        FROM documents GROUP BY 1
    ),
    g AS (
        SELECT source, n_tokens, n_tokens AS cap_tokens,
               CAST(ROW_NUMBER() OVER (ORDER BY n_tokens, source) AS BIGINT)
                   AS k,
               CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY n_tokens, source
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS s_before
        FROM counts
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS L,
               CAST((SUM(n_tokens) * 9) // 10 AS BIGINT) AS B
        FROM counts
    ),
    c AS (
        SELECT g.*, tot.L, tot.B,
               cap_tokens * (L - k + 1) <= B - s_before AS capped
        FROM g CROSS JOIN tot
    ),
    kf AS (
        SELECT CAST(SUM(CASE WHEN capped THEN 1 ELSE 0 END) AS BIGINT) AS kk,
               CAST(SUM(CASE WHEN capped THEN cap_tokens ELSE 0 END)
                    AS BIGINT) AS sk
        FROM c
    ),
    a AS (
        SELECT c.source, c.n_tokens, c.cap_tokens, c.capped,
               CAST(CASE
                    WHEN c.L = kf.kk OR c.capped THEN c.cap_tokens
                    ELSE (c.B - kf.sk) // (c.L - kf.kk)
                         + (CASE WHEN c.k - kf.kk
                                      <= (c.B - kf.sk) % (c.L - kf.kk)
                                 THEN 1 ELSE 0 END)
                    END AS BIGINT) AS alloc_tokens
        FROM c CROSS JOIN kf
    )
    SELECT source, n_tokens, cap_tokens, capped, alloc_tokens,
           CAST(CASE WHEN n_tokens > 0
                     THEN (alloc_tokens * 1000000) // n_tokens
                     ELSE 0 END AS BIGINT) AS epochs_micro
    FROM a
"""


@query("sample_unimax_allocation", _UNIMAX_ORACLE)
def q_sample_unimax_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax epoch-capped budget waterfill (operators/sampling.
    unimax_allocation — Chung et al. 2023): 90% of the corpus's
    characters split as uniformly as possible across the 20 sources,
    no source repeated past max_epochs=1 — small sources cap out at
    their full size and the residual waterfills into the big ones,
    remainder tokens handed deterministically to the smallest-cap
    uncapped sources. The closed-form prefix test replaces the
    iterative waterfill; every window runs over the 20-row GROUP
    frame. All int64 — the oracle replays the sort, the prefix test,
    the truncating share division and the remainder distribution."""
    docs = _t(spark, sf_dir, "documents").select("source", "n_chars")
    return SMP.unimax_allocation(
        docs, "source", "n_chars",
        budget_num=9, budget_den=10, max_epochs=1,
    )


_ENSEMBLE_ORACLE = f"""
    WITH wq AS (
        SELECT doc_id,
               list_filter(string_split_regex(trim(regexp_replace(lower(text),
                   '[^a-z0-9]+', ' ', 'g')), ' '), x -> len(x) > 0) AS w
        FROM documents
    ),
    m AS (
        SELECT doc_id,
               CAST(COALESCE(list_sum(list_transform(w, x -> {_HLW})), 0)
                    AS BIGINT) AS logit_milli
        FROM wq
    ),
    g AS (
        SELECT doc_id,
               unnest(CASE WHEN len(w) >= 2
                           THEN list_transform(range(1, len(w)),
                                               i -> w[i] || ' ' || w[i + 1])
                           ELSE [] END) AS gram
        FROM wq
    ),
    gh AS (
        SELECT doc_id,
               CAST('0x' || substr(md5(gram), 1, 15) AS BIGINT) AS ghash
        FROM g
    ),
    census AS (SELECT ghash, COUNT(*) AS freq FROM gh GROUP BY 1),
    per_doc AS (
        SELECT doc_id, COUNT(*) AS n_grams,
               CAST(SUM(freq) AS BIGINT) AS sum_freq
        FROM gh JOIN census USING (ghash) GROUP BY 1
    ),
    s AS (
        SELECT m.doc_id, m.logit_milli,
               CAST(CASE WHEN COALESCE(p.sum_freq, 0) > 0
                         THEN (1000000000 * p.n_grams) // p.sum_freq
                         ELSE 1000000000 END AS BIGINT) AS weight_nano
        FROM m LEFT JOIN per_doc p ON m.doc_id = p.doc_id
    ),
    r AS (
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (ORDER BY logit_milli DESC, doc_id)
                    AS BIGINT) AS rank_logit_milli,
               CAST(ROW_NUMBER() OVER (ORDER BY weight_nano DESC, doc_id)
                    AS BIGINT) AS rank_weight_nano
        FROM s
    )
    SELECT doc_id, rank_logit_milli, rank_weight_nano,
           rank_logit_milli + rank_weight_nano AS rank_sum,
           CAST(ROW_NUMBER() OVER (
               ORDER BY rank_logit_milli + rank_weight_nano, doc_id)
               AS BIGINT) AS fused_rank
    FROM r
"""


@query("quality_rank_ensemble", _ENSEMBLE_ORACLE)
def q_quality_rank_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-signal curation rank fusion (operators/sampling.
    rank_fusion, round 14): the hashed-linear QUALITY logit and the
    SoftDeDup UNIQUENESS weight are each converted to their exact
    global rank via the bucket decomposition (no global sort
    anywhere), summed, and re-ranked — the calibration-free ensemble
    order an LLM curation pipeline feeds into the token-budget gate.
    The oracle replays both signals and all three rankings as plain
    single-partition windows, so the hash match proves every
    decomposed ranking AND the fusion arithmetic."""
    from .operators import text as TX

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    scored = TX.hashed_linear_score(docs).select("doc_id", "logit_milli")
    weights = TX.soft_dedup_weights(docs).select("doc_id", "weight_nano")
    joined = scored.join(weights, "doc_id")
    out = SMP.rank_fusion(
        joined,
        "doc_id",
        ["logit_milli", "weight_nano"],
        bucket_width={"logit_milli": 100, "weight_nano": 1_000_000},
    )
    return out.select(
        "doc_id", "rank_logit_milli", "rank_weight_nano",
        "rank_sum", "fused_rank",
    )
