"""Driver queries for retrieval (operators/retrieval.py): BM25 lexical
top-k and hybrid lexical+vector reciprocal rank fusion over the
documents/embeddings tables. All ranking math is engine-portable by
construction (rational idf, integer-nano quantization before sums,
decimal-fold cosine) — see the operator module's determinism policy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.retrieval import bm25_topk, rrf_fuse
from .queries import _t, query
from .queries_ext import _DOT_DEC, _WORDS

_BM25_QUERIES = [
    (1, "spark join filter"),
    (2, "customer order data window"),
]
_BM25_QUERIES_SQL = "VALUES " + ", ".join(
    f"({i}, '{t}')" for i, t in _BM25_QUERIES
)

# The BM25 pipeline in DuckDB SQL, shared by both driver queries. Every
# arithmetic step mirrors the Spark expression tree exactly (left-assoc
# mul/div over values derived from exact integers), and per-term scores
# quantize to floor(score*1e9) BEFORE the per-doc sum.
_BM25_CORE = f"""
    w AS (
        SELECT doc_id, UNNEST({_WORDS}) AS term FROM documents
    ),
    wnz AS (SELECT doc_id, term FROM w WHERE term <> ''),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM wnz GROUP BY 1, 2),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM wnz GROUP BY 1),
    stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total_len FROM dl),
    qraw AS (SELECT * FROM ({{queries}}) AS q(query_id, query_text)),
    qterms AS (
        SELECT DISTINCT query_id, UNNEST(
            string_split_regex(
                trim(regexp_replace(lower(query_text), '[^a-z0-9]+', ' ', 'g')),
                ' ')) AS term
        FROM qraw
    ),
    qt AS (SELECT query_id, term FROM qterms WHERE term <> ''),
    tpost AS (
        SELECT tf.* FROM tf
        WHERE term IN (SELECT DISTINCT term FROM qt)
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tpost GROUP BY 1),
    scored AS (
        SELECT q.query_id, p.doc_id,
               COUNT(*) AS n_terms_hit,
               CAST(SUM(CAST(floor(
                   ((s.n_docs - f.df + 0.5) / (f.df + 0.5))
                   * (p.tf * 2.2)
                   / (CAST(p.tf AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 *
                      (CAST(d.dl AS DOUBLE)
                       / (CAST(s.total_len AS DOUBLE) / s.n_docs))))
                   * 1000000000.0) AS BIGINT)) AS BIGINT) AS score_nano
        FROM tpost p
        JOIN qt q USING (term)
        JOIN dfreq f USING (term)
        JOIN dl d USING (doc_id)
        CROSS JOIN stats s
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT query_id, doc_id, n_terms_hit, score_nano,
               CAST(score_nano AS DOUBLE) / 1000000000.0 AS score,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY score_nano DESC, doc_id ASC) AS INT) AS rank
        FROM scored
    )
"""

_BM25_ORACLE = (
    "WITH "
    + _BM25_CORE.format(queries=_BM25_QUERIES_SQL)
    + """
    SELECT query_id, doc_id, n_terms_hit, score_nano, score, rank
    FROM ranked WHERE rank <= 10
    """
)


@query("bm25_topk", _BM25_ORACLE)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical retrieval (operators/retrieval.bm25_topk): top-10
    documents for two bag-of-words queries, k1=1.2 b=0.75, rational idf
    (N-df+0.5)/(df+0.5) and integer-nano per-term quantization so the
    ranking is bit-identical across engines. The corpus side is the
    inverted-index access pattern: tf aggregates once, the broadcast
    query terms select only their postings, and everything downstream is
    proportional to those postings — never the corpus."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    qdf = spark.createDataFrame(_BM25_QUERIES, "query_id int, query_text string")
    return bm25_topk(docs, qdf, k=10)


_HYBRID_ORACLE = (
    "WITH "
    + _BM25_CORE.format(
        queries="VALUES (0, 'spark query data the window scan')"
    )
    + f""",
    lex AS (SELECT query_id, doc_id, rank FROM ranked WHERE rank <= 20),
    qvec AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id = 0),
    cos AS (
        SELECT a.vec_id AS query_id, b.vec_id AS doc_id,
               CAST({_DOT_DEC} AS DOUBLE)
               / (SQRT(CAST((SELECT SUM(CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE) AS DECIMAL(28,15)))
                             FROM (SELECT UNNEST(a.embedding) AS x)) AS DOUBLE))
                  * SQRT(CAST((SELECT SUM(CAST(CAST(y AS DOUBLE)*CAST(y AS DOUBLE) AS DECIMAL(28,15)))
                               FROM (SELECT UNNEST(b.embedding) AS y)) AS DOUBLE)))
                   AS cosine
        FROM qvec a JOIN embeddings b ON a.vec_id != b.vec_id
    ),
    vec AS (
        SELECT query_id, doc_id, rank FROM (
            SELECT query_id, doc_id,
                   CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, doc_id ASC) AS INT) AS rank
            FROM cos
        ) WHERE rank <= 20
    ),
    tagged AS (
        SELECT query_id, doc_id, rank FROM lex
        UNION ALL
        SELECT query_id, doc_id, rank FROM vec
    ),
    fused AS (
        SELECT query_id, doc_id,
               COUNT(*) AS n_systems,
               CAST(SUM(CAST(floor(1000000000.0 / (60 + rank)) AS BIGINT))
                    AS BIGINT) AS rrf_nano
        FROM tagged GROUP BY 1, 2
    )
    SELECT query_id, doc_id, n_systems, rrf_nano,
           CAST(rrf_nano AS DOUBLE) / 1000000000.0 AS rrf_score,
           CAST(rnk AS INT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY rrf_nano DESC, doc_id ASC) AS rnk
          FROM fused)
    WHERE rnk <= 10
    """
)


@query("hybrid_rrf_fusion", _HYBRID_ORACLE)
def q_hybrid_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval (operators/retrieval.rrf_fuse; Cormack et al.
    SIGIR 2009): BM25 top-20 for a text query FUSED with exact-cosine
    top-20 for the matching embedding (vec_id 0 aligns with doc_id 0),
    rrf_nano = Σ floor(1e9/(60+rank)) summed as integers. Docs surfaced
    by both systems rank first (n_systems = 2). The fusion itself is one
    union + one integer aggregate over the two top-k lists — its cost is
    independent of corpus size; each ranker's scale story is its own
    (inverted index / ANN siblings)."""
    from .operators.similarity import brute_force_topk

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    emb = _t(spark, sf_dir, "embeddings")
    qdf = spark.createDataFrame(
        [(0, "spark query data the window scan")], "query_id int, query_text string"
    )
    lex = bm25_topk(docs, qdf, k=20).select("query_id", "doc_id", "rank")
    vec = (
        brute_force_topk(emb, emb.filter(F.col("vec_id") == 0), k=20)
        .select(
            "query_id", F.col("neighbor_id").alias("doc_id"), "rank"
        )
    )
    return rrf_fuse([("bm25", lex), ("cosine", vec)], k0=60, k=10)


_TOK = ("len(list_filter(string_split_regex(trim(regexp_replace(lower(text),"
        " '[^a-z0-9]+', ' ', 'g')), ' '), x -> x <> ''))")

_PACK_ORACLE = (
    "WITH "
    + _BM25_CORE.format(queries=_BM25_QUERIES_SQL)
    + f""",
    tok AS (SELECT doc_id, CAST({_TOK} AS BIGINT) AS n_tokens FROM documents),
    sel AS (
        SELECT r.query_id, r.doc_id, r.rank, t.n_tokens,
               CAST(SUM(t.n_tokens) OVER (
                   PARTITION BY r.query_id ORDER BY r.rank
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_tokens
        FROM ranked r JOIN tok t USING (doc_id)
        WHERE r.rank <= 10
    )
    SELECT query_id, doc_id, rank, n_tokens, cum_tokens
    FROM sel WHERE cum_tokens <= 300
    """
)


@query("rag_context_pack", _PACK_ORACLE)
def q_rag_context_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG context assembly (operators/retrieval.context_pack): the BM25
    top-10 per query joined with exact word-token counts, then cut to
    the rank-order prefix fitting a 300-token context budget — the
    deterministic packing step between retrieval and prompt
    construction (prefix-cut by the ranker's order, not a knapsack).
    One window over the per-query top-k list; cost independent of
    corpus size."""
    from .functions.text import words
    from .operators.retrieval import context_pack

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    qdf = spark.createDataFrame(_BM25_QUERIES, "query_id int, query_text string")
    ranked = bm25_topk(docs, qdf, k=10).select("query_id", "doc_id", "rank")
    tok = docs.select(
        "doc_id", F.size(words("text")).cast("long").alias("n_tokens")
    )
    return context_pack(
        ranked.join(tok, "doc_id").select(
            "query_id", "doc_id", "rank", "n_tokens"
        ),
        "n_tokens",
        budget=300,
    )
