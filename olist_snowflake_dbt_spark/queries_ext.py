"""Driver queries for the LLM-data-pipeline extensions (SURVEY.md §7
phase 5): dedup, similarity search, text analysis. Registered into the
same QUERIES/ORACLE_SQL maps as the relational surface.

Planted duplicates: the testdata has no exact dups, so dedup queries
deterministically plant them (docs with doc_id % 50 == 0 re-appear under
doc_id + 1_000_000) — the SAME construction in Spark and the oracle SQL.

Oracle vector math: DuckDB's list_dot_product uses SIMD/f32 accumulation
and does NOT match a sequential fold; the oracles instead zip-unnest and
sum CAST(x*y AS DECIMAL(28,15)) — the exact-decimal contract of
functions/vector.py — so cosine scores are bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import dedup as DD
from .operators import similarity as SIM
from .operators import text as TX
from .queries import _t, query

# ---------------------------------------------------------------------
# shared SQL fragments
# ---------------------------------------------------------------------

_NORM = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"
_WORDS = f"string_split_regex({_NORM}, ' ')"
_PLANTED_DOCS = """
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 50 = 0
"""
_PLANTED_EMB = """
    SELECT vec_id, embedding, label FROM embeddings
    UNION ALL
    SELECT vec_id + 1000000 AS vec_id, embedding, label
    FROM embeddings WHERE vec_id % 100 = 0
"""
_DOT_DEC = (
    "(SELECT SUM(CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(28,15)))"
    " FROM (SELECT UNNEST(a.embedding) AS x, UNNEST(b.embedding) AS y))"
)


def _planted_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    dup = (
        docs.filter(F.col("doc_id") % 50 == 0)
        .withColumn("doc_id", F.col("doc_id") + 1000000)
    )
    return docs.unionByName(dup)


def _planted_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    dup = (
        emb.filter(F.col("vec_id") % 100 == 0)
        .withColumn("vec_id", F.col("vec_id") + 1000000)
    )
    return emb.unionByName(dup)


# ---------------------------------------------------------------------
# deduplication
# ---------------------------------------------------------------------


@query(
    "dedup_exact",
    f"""
    WITH d2 AS ({_PLANTED_DOCS})
    SELECT md5({_NORM}) AS doc_fingerprint, MIN(doc_id) AS doc_id
    FROM d2 GROUP BY 1
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one shuffle on the normalized-text fingerprint, keep
    the smallest id per group (operators/dedup.exact_dedup)."""
    from .functions.text import fingerprint

    kept = DD.exact_dedup(_planted_docs(spark, sf_dir), "text", "doc_id")
    return kept.select(fingerprint("text").alias("doc_fingerprint"), "doc_id")


@query(
    "dedup_ngram_jaccard",
    f"""
    WITH d2 AS ({_PLANTED_DOCS}),
    sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, greatest(len(w) - 2, 1)),
                   i -> array_to_string(w[i:i+2], ' '))) AS shingles
        FROM (SELECT doc_id, {_WORDS} AS w FROM d2)
    ),
    ex AS (SELECT doc_id, len(shingles) AS n, UNNEST(shingles) AS s FROM sh),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS n_a, b.n AS n_b,
               COUNT(*) AS n_common
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4
    )
    SELECT id_a, id_b, n_common / (n_a + n_b - n_common) AS jaccard
    FROM inter WHERE n_common / (n_a + n_b - n_common) >= 0.5
    """,
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs ≥ 0.5 via shingle inverted
    index (operators/dedup.ngram_jaccard_pairs)."""
    return DD.ngram_jaccard_pairs(_planted_docs(spark, sf_dir), "text", "doc_id", 3, 0.5)


@query(
    "dedup_containment",
    f"""
    WITH d2 AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        -- plant truncated near-superset copies: the first half of every
        -- 40th document under a shifted id
        SELECT doc_id + 2000000 AS doc_id,
               substr(text, 1, length(text) // 2) AS text
        FROM documents WHERE doc_id % 40 = 0
    ),
    sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, greatest(len(w) - 2, 1)),
                   i -> array_to_string(w[i:i+2], ' '))) AS shingles
        FROM (SELECT doc_id, {_WORDS} AS w FROM d2)
    ),
    ex AS (SELECT doc_id, len(shingles) AS n, UNNEST(shingles) AS s FROM sh),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS n_a, b.n AS n_b,
               COUNT(*) AS n_common
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4
    )
    SELECT id_a, id_b, n_common / least(n_a, n_b) AS containment
    FROM inter WHERE n_common / least(n_a, n_b) >= 0.8
    """,
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment |A∩B|/min(|A|,|B|) ≥ 0.8: catches planted
    half-documents inside their full originals, which Jaccard ≈ 0.5
    misses at high thresholds (operators/dedup.containment_pairs)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    halves = (
        docs.filter(F.col("doc_id") % 40 == 0)
        .select(
            (F.col("doc_id") + 2000000).alias("doc_id"),
            F.substring("text", 1, F.floor(F.length("text") / 2).cast("int")).alias("text"),
        )
    )
    return DD.containment_pairs(docs.unionByName(halves), "text", "doc_id", 3, 0.8)


@query("dedup_minhash_lsh")  # rows-only: 64 salted xxhash64 minima not SQL-portable
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64) + LSH(16 bands): candidates where a band collides,
    est. Jaccard ≥ 0.5 (operators/dedup.minhash_lsh_pairs). Verified in
    tests/test_dedup.py against exact Jaccard (recall on planted dups)."""
    return DD.minhash_lsh_pairs(_planted_docs(spark, sf_dir), "text", "doc_id",
                                n=3, num_hashes=64, bands=16, threshold=0.5)


@query("dedup_simhash")  # rows-only: bit-level simhash not SQL-portable
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash near-dup pairs (Hamming ≤ 3, banded pigeonhole
    join) — operators/dedup.simhash_pairs."""
    return DD.simhash_pairs(_planted_docs(spark, sf_dir), "text", "doc_id",
                            max_hamming=3, bands=4)


@query(
    "dedup_embedding_cosine",
    f"""
    WITH e2 AS ({_PLANTED_EMB})
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           CAST({_DOT_DEC} AS DOUBLE)
           / (SQRT(CAST((SELECT SUM(CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE) AS DECIMAL(28,15)))
                         FROM (SELECT UNNEST(a.embedding) AS x)) AS DOUBLE))
              * SQRT(CAST((SELECT SUM(CAST(CAST(y AS DOUBLE)*CAST(y AS DOUBLE) AS DECIMAL(28,15)))
                           FROM (SELECT UNNEST(b.embedding) AS y)) AS DOUBLE)))
               AS cosine
    FROM e2 a JOIN e2 b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE CAST({_DOT_DEC} AS DOUBLE)
          / (SQRT(CAST((SELECT SUM(CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE) AS DECIMAL(28,15)))
                        FROM (SELECT UNNEST(a.embedding) AS x)) AS DOUBLE))
             * SQRT(CAST((SELECT SUM(CAST(CAST(y AS DOUBLE)*CAST(y AS DOUBLE) AS DECIMAL(28,15)))
                          FROM (SELECT UNNEST(b.embedding) AS y)) AS DOUBLE))) >= 0.95
    """,
)
def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup: cosine ≥ 0.95 among label-blocked pairs
    (blocking keeps the verify path sub-quadratic; planted exact dups
    score 1.0). Decimal dot → bit-identical across engines."""
    e2 = _planted_emb(spark, sf_dir)
    return DD.embedding_cosine_pairs(e2, "embedding", "vec_id", 0.95, block_col="label")


@query(
    "dedup_connected_components",
    f"""
    WITH RECURSIVE d2 AS ({_PLANTED_DOCS}),
    sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, greatest(len(w) - 2, 1)),
                   i -> array_to_string(w[i:i+2], ' '))) AS shingles
        FROM (SELECT doc_id, {_WORDS} AS w FROM d2)
    ),
    ex AS (SELECT doc_id, len(shingles) AS n, UNNEST(shingles) AS s FROM sh),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS n_a, b.n AS n_b,
               COUNT(*) AS n_common
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4
    ),
    pairs AS (
        SELECT id_a, id_b FROM inter
        WHERE n_common / (n_a + n_b - n_common) >= 0.6
    ),
    edges AS (
        SELECT id_a AS node, id_b AS other FROM pairs
        UNION
        SELECT id_b AS node, id_a AS other FROM pairs
    ),
    reach AS (
        SELECT node, other FROM edges
        UNION
        SELECT r.node, e.other FROM reach r JOIN edges e ON r.other = e.node
    )
    SELECT node, least(node, MIN(other)) AS component
    FROM reach GROUP BY node
    """,
)
def q_dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact transitive dedup clusters: iterative min-label propagation
    (operators/dedup.connected_components) over n-gram-Jaccard ≥ 0.6
    edges. The oracle computes the same fixpoint with a DuckDB recursive
    CTE — Spark's loop-of-joins with localCheckpoint IS the scalable
    twin of WITH RECURSIVE for small-diameter graphs."""
    pairs = DD.ngram_jaccard_pairs(_planted_docs(spark, sf_dir), "text", "doc_id", 3, 0.6)
    return DD.connected_components(pairs)


# ---------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------


@query(
    "similarity_brute_topk",
    f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
    scored AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               CAST({_DOT_DEC} AS DOUBLE)
               / (SQRT(CAST((SELECT SUM(CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE) AS DECIMAL(28,15)))
                             FROM (SELECT UNNEST(a.embedding) AS x)) AS DOUBLE))
                  * SQRT(CAST((SELECT SUM(CAST(CAST(y AS DOUBLE)*CAST(y AS DOUBLE) AS DECIMAL(28,15)))
                               FROM (SELECT UNNEST(b.embedding) AS y)) AS DOUBLE)))
                   AS cosine
        FROM q a JOIN embeddings b ON a.vec_id != b.vec_id
    )
    SELECT query_id, neighbor_id, ROUND(cosine, 9) AS cosine,
           CAST(rnk AS INT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) AS rnk
          FROM scored)
    WHERE rnk <= 10
    """,
)
def q_similarity_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for queries vec_id < 10: broadcast queries ×
    partitioned corpus, windowed rank (operators/similarity). The output
    score is rounded to 9 decimals: DuckDB's DECIMAL→DOUBLE cast is not
    correctly rounded, so raw doubles can differ in the last ulp."""
    emb = _t(spark, sf_dir, "embeddings")
    out = SIM.brute_force_topk(emb, emb.filter(F.col("vec_id") < 10), k=10)
    return out.withColumn("cosine", F.round("cosine", 9))


@query("similarity_ann_lsh")  # rows-only: hyperplane projections not SQL-portable
def q_similarity_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via random-hyperplane LSH banding; recall vs
    brute force asserted in tests/test_similarity.py."""
    emb = _t(spark, sf_dir, "embeddings")
    return SIM.ann_lsh_topk(emb, emb.filter(F.col("vec_id") < 10), dim=64, k=10)


@query("similarity_ivf")  # rows-only: centroid assignment not SQL-portable
def q_similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: hash-sampled centroids, nprobe cell probing."""
    emb = _t(spark, sf_dir, "embeddings")
    return SIM.ivf_topk(emb, emb.filter(F.col("vec_id") < 10), k=10,
                        n_cells=16, nprobe=4)


# ---------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------


@query(
    "text_token_stats",
    r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '\S+')) AS n_tokens,
           len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]'))
               AS n_subword_tokens,
           length(text) AS n_chars_measured
    FROM documents
    """,
)
def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token accounting: whitespace tokens + BPE-ish subword regex count
    (operators/text.token_stats)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return TX.token_stats(docs).select(
        "doc_id", "n_tokens", "n_subword_tokens", "n_chars_measured")


def _lang_hits_sql(lang: str) -> str:
    pats = [w if lang == "zh" else f" {w} " for w in TX.STOPWORDS[lang]]
    padded = "(' ' || regexp_replace(lower(text), '\\s+', ' ', 'g') || ' ')"
    terms = [
        f"CAST((length({padded}) - length(replace({padded}, '{p}', ''))) / {len(p)} AS BIGINT)"
        for p in pats
    ]
    return " + ".join(terms)


_LANG_SCORED = " UNION ALL ".join(
    f"SELECT doc_id, '{lang}' AS lang_cand, {_lang_hits_sql(lang)} AS hits FROM documents"
    for lang in sorted(TX.STOPWORDS)
)


@query(
    "text_language_id",
    f"""
    WITH scored AS ({_LANG_SCORED}),
    ranked AS (
        SELECT doc_id, lang_cand,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY hits DESC, lang_cand ASC) AS rn
        FROM scored
    )
    SELECT doc_id, lang_cand AS predicted_lang FROM ranked WHERE rn = 1
    """,
)
def q_text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language ID (operators/text.language_id): argmax of
    per-language stopword occurrence counts, ties to first language."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return TX.language_id(docs).select("doc_id", "predicted_lang")


@query(
    "text_fingerprint",
    f"""
    SELECT doc_id, md5({_NORM}) AS doc_fingerprint FROM documents
    """,
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over normalized text
    (functions/text.fingerprint)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return TX.add_fingerprint(docs).select("doc_id", "doc_fingerprint")


@query(
    "text_quality_score",
    r"""
    WITH feat AS (
        SELECT doc_id,
               len(regexp_extract_all(text, '\S+')) AS n_tokens,
               length(text) AS n_chars,
               length(text) - length(regexp_replace(text, '[\.,!\?;:]', '', 'g')) AS n_punct,
               length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit
        FROM documents
    )
    SELECT doc_id, n_tokens,
           CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END AS punct_ratio,
           CASE WHEN n_chars > 0 THEN n_digit / n_chars ELSE 0.0 END AS digit_ratio
    FROM feat
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality features (deterministic subset: counts + ratios)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return TX.quality_score(docs).select(
        "doc_id", "n_tokens", "punct_ratio", "digit_ratio")
