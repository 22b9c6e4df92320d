"""Search-and-retrieval operators: BM25 lexical ranking and reciprocal
rank fusion (RRF) for hybrid lexical+vector retrieval.

A training-data pipeline retrieves at corpus scale constantly — mining
hard negatives, building eval sets, grounding RAG corpora — and the
standard recipe is BM25 (lexical) fused with ANN cosine (semantic) via
RRF, which is exactly what warehouse-native search (and e.g. Elastic /
Vespa hybrid mode) runs. Public references: Robertson & Spärck Jones
BM25 (k1/b parameterization); Cormack, Clarke & Buettcher, "Reciprocal
Rank Fusion outperforms Condorcet and individual Rank Learning Methods"
(SIGIR 2009), score = Σ 1/(k0 + rank), k0 = 60.

Determinism policy (same as operators/text.tfidf_topk): engine-portable
scores use only IEEE-exact ops. BM25's idf uses the RATIONAL surrogate
``(N - df + 0.5) / (df + 0.5)`` — the argument of the classic
``log((N-df+0.5)/(df+0.5))`` without the log, strictly monotone in it,
so per-term ordering is identical while staying bit-reproducible across
engines (libm ``log`` is not correctly rounded). Per-term scores are
quantized to integer nanos with ``floor(x * 1e9)`` BEFORE the per-doc
sum: double addition is order-dependent across engines, integer
addition is not.

Scale shape: the corpus tokenizes map-side (explode inside codegen);
``tf`` aggregates on (doc, term) with partial combine; query terms are
tiny and broadcast everywhere they appear; ``df`` counts only the query
terms' postings (semi-joined first), so the per-query cost is
proportional to the postings of the query's terms — the inverted-index
access pattern — not the corpus. RRF is one union + one integer-sum
aggregate on (query, doc).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import words
from ._cache import scoped_persist

NANO = 1_000_000_000


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents per query under BM25 (rational idf).

    Per (doc, query term): ``idf * (tf*(k1+1)) / (tf + k1*(1 - b +
    b*dl/avgdl))`` with ``idf = (N - df + 0.5)/(df + 0.5)``; every
    factor derives from exact integers (tf, df, dl, N) through IEEE
    mul/div only, then quantizes to ``score_nano = floor(score*1e9)``
    and SUMS AS INTEGERS per (query, doc). Repeated query terms count
    once (distinct), the common bag-of-words simplification.

    Returns ``(query_id, doc_id, n_terms_hit, score_nano, score,
    rank)``; rank breaks score ties by doc id for a total order.
    """
    w = docs.select(F.col(id_col), F.explode(words(text_col)).alias("term"))
    w = w.filter(F.col("term") != "")
    # round 14: tf is the hub every downstream branch reads (doc
    # lengths, the df census, the postings probe) — persisted, the
    # corpus word explode runs ONCE instead of four times; dl = Σ tf
    # per doc (identical to counting words directly) saves the second
    # explode outright (guide §1.2)
    tf = scoped_persist(
        w.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    )
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_len"),
    )  # 1 row — broadcast scalar

    qterms = queries.select(
        F.col(query_id_col),
        F.explode_outer(words(query_text_col)).alias("term"),
    ).filter(F.col("term") != "").dropDuplicates([query_id_col, "term"])

    # inverted-index probe: only the query terms' postings leave the scan
    term_postings = tf.join(
        F.broadcast(qterms.select("term").dropDuplicates()), "term"
    )
    # tf is distinct per (doc, term), so df is a plain count per term
    dfreq = term_postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    postings = term_postings.join(F.broadcast(qterms), "term")

    avgdl = F.col("total_len").cast("double") / F.col("n_docs")
    idf = (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    tfd = F.col("tf").cast("double")
    denom = tfd + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * (F.col("dl").cast("double") / avgdl)
    )
    term_score = idf * (tfd * F.lit(k1 + 1.0)) / denom

    scored = (
        postings.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .join(F.broadcast(stats))
        .withColumn("term_nano", F.floor(term_score * F.lit(NANO)))
        .groupBy(query_id_col, id_col)
        .agg(
            F.count(F.lit(1)).alias("n_terms_hit"),
            F.sum("term_nano").alias("score_nano"),
        )
    )
    win = Window.partitionBy(query_id_col).orderBy(
        F.col("score_nano").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .withColumn("score", F.col("score_nano").cast("double") / F.lit(float(NANO)))
        .select(query_id_col, id_col, "n_terms_hit", "score_nano", "score", "rank")
    )


def rrf_fuse(
    rankings: Sequence[tuple[str, DataFrame]],
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k0: int = 60,
    k: int = 10,
) -> DataFrame:
    """Reciprocal rank fusion of N rankers' ``(query, doc, rank)`` lists.

    ``rrf_nano = Σ_systems floor(1e9 / (k0 + rank))`` — the SIGIR-2009
    formula in integer nanos so the cross-system sum is order-exact on
    any engine. A doc missing from one ranker's list simply contributes
    nothing for that system (standard top-k-list RRF). Returns
    ``(query_id, doc_id, n_systems, rrf_nano, rrf_score, rank)``.

    One union (map-side) + one integer aggregate on (query, doc) + the
    per-query top-k window — no shuffle wider than the union of the
    input top-k lists, independent of corpus size.
    """
    tagged = None
    for name, r in rankings:
        t = r.select(
            F.col(query_id_col),
            F.col(id_col),
            F.col(rank_col).cast("long").alias("__rank"),
            F.lit(name).alias("__system"),
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    if tagged is None:
        raise ValueError("rrf_fuse: no rankings given")
    fused = tagged.groupBy(query_id_col, id_col).agg(
        F.count(F.lit(1)).alias("n_systems"),
        F.sum(
            F.floor(F.lit(float(NANO)) / (F.lit(k0) + F.col("__rank")))
        ).alias("rrf_nano"),
    )
    win = Window.partitionBy(query_id_col).orderBy(
        F.col("rrf_nano").desc(), F.col(id_col).asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .withColumn("rrf_score", F.col("rrf_nano").cast("double") / F.lit(float(NANO)))
        .select(query_id_col, id_col, "n_systems", "rrf_nano", "rrf_score", "rank")
    )


def context_pack(
    ranked: DataFrame,
    token_col: str,
    budget: int,
    query_id_col: str = "query_id",
    rank_col: str = "rank",
) -> DataFrame:
    """RAG context assembly: from a per-query ranked candidate list,
    keep the rank-order PREFIX whose running token total fits the
    context ``budget`` — the deterministic packing step between
    retrieval and prompt construction (prefix-cut, not knapsack: the
    ranker's order is the relevance contract, so skipping a large doc
    to admit a lower-ranked small one is deliberately NOT done; that
    trade is the ranker's job).

    Adds ``cum_tokens`` (running total including the row). A doc whose
    tokens alone exceed the budget is dropped with everything after it.
    One window over the per-query top-k list — cost independent of
    corpus size.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    w = (
        Window.partitionBy(query_id_col)
        .orderBy(F.col(rank_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col)).over(w)
    return ranked.withColumn("cum_tokens", cum).filter(
        F.col("cum_tokens") <= budget
    )


def mmr_rerank(
    candidates: DataFrame,
    pair_sims: DataFrame,
    k: int = 3,
    lam_num: int = 7,
    lam_den: int = 10,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR 1998): greedily pick ``k`` docs per query maximizing
    ``λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s)`` — the diversity
    pass between ANN retrieval and RAG context packing that stops the
    prompt filling up with near-duplicates of the top hit.

    Inputs are POST-candidate-generation (compose with ann_lsh/ivf_topk
    for the sub-linear corpus stage):

    - ``candidates``: (query_id, doc_id, rel_nano) — relevance in
      integer nanos (``floor(cosine * 1e9)``), computed Catalyst-side.
    - ``pair_sims``: (query_id, doc_a, doc_b, sim_nano) — pairwise
      candidate-candidate similarity, same integer encoding. With N
      candidates per query this is O(N²) per query — bounded by the
      candidate CAP, never by corpus size, which is what makes MMR
      viable at 100 TB: the quadratic term is 144 rows for N=12.

    The greedy argmax runs per query in a cogrouped Arrow kernel
    (`cogroup().applyInPandas`): one co-partitioned shuffle per side,
    then pure INTEGER arithmetic — ``lam_num·rel − (lam_den−lam_num)·
    max_sim`` with ties to the smaller doc_id — so a SQL oracle can
    replay the selection bit-exactly (λ as a rational, never a float).
    Rank 1 is pure relevance (max_sim term is 0 by definition).

    Returns (query_id, rank 1..k, doc_id, mmr_nano).
    """
    if not (0 < lam_num <= lam_den):
        raise ValueError(f"need 0 < lam_num <= lam_den, got {lam_num}/{lam_den}")
    mu = lam_den - lam_num

    def kernel(cand_pdf, sim_pdf):
        import pandas as pd

        if cand_pdf.empty:
            return pd.DataFrame(
                columns=["query_id", "rank", "doc_id", "mmr_nano"]
            )
        qid = int(cand_pdf["query_id"].iloc[0])
        rel = {
            int(d): int(r)
            for d, r in zip(cand_pdf["doc_id"], cand_pdf["rel_nano"])
        }
        sim = {
            (int(a), int(b)): int(s)
            for a, b, s in zip(
                sim_pdf["doc_a"], sim_pdf["doc_b"], sim_pdf["sim_nano"]
            )
        }
        selected: list[int] = []
        out = []
        remaining = sorted(rel)
        for rank in range(1, k + 1):
            if not remaining:
                break
            best_doc, best_score = None, None
            for d in remaining:  # ≤ candidate cap — O(N·k) integer ops
                ms = max((sim.get((d, s), 0) for s in selected), default=0)
                score = lam_num * rel[d] - mu * ms
                if best_score is None or score > best_score:
                    best_doc, best_score = d, score
                # ties: remaining is sorted asc, so the first (smallest
                # doc_id) wins and later equal scores never replace it
            out.append((qid, rank, best_doc, best_score))
            selected.append(best_doc)
            remaining.remove(best_doc)
        return pd.DataFrame(
            out, columns=["query_id", "rank", "doc_id", "mmr_nano"]
        )

    return (
        candidates.groupBy("query_id")
        .cogroup(pair_sims.groupBy("query_id"))
        .applyInPandas(
            kernel, "query_id long, rank int, doc_id long, mmr_nano long"
        )
    )
