"""operators/retrieval.py: BM25 ranking sanity, integer-nano
determinism, RRF fusion semantics, and the broadcast inverted-index
plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olist_snowflake_dbt_spark.operators.retrieval import bm25_topk, rrf_fuse


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "apple banana apple cherry"),
            (2, "apple banana"),
            (3, "banana cherry date"),
            (4, "unrelated words entirely"),
            (5, "apple apple apple apple apple apple apple apple"),
        ],
        "doc_id int, text string",
    )


def _q(spark, text):
    return spark.createDataFrame([(1, text)], "query_id int, query_text string")


def test_bm25_ranks_relevant_docs_first(spark, corpus):
    out = bm25_topk(corpus, _q(spark, "apple cherry"), k=5).collect()
    ranked = [r.doc_id for r in sorted(out, key=lambda r: r.rank)]
    assert ranked[0] == 1  # both terms, good balance
    assert 4 not in ranked  # no query term -> absent
    by_id = {r.doc_id: r for r in out}
    assert by_id[1].n_terms_hit == 2 and by_id[2].n_terms_hit == 1
    # doc 5 spams 'apple': tf saturation (k1) must keep it from
    # dominating the two-term match
    assert by_id[5].rank > by_id[1].rank


def test_bm25_rare_term_outweighs_common(spark, corpus):
    out = {r.doc_id: r for r in bm25_topk(corpus, _q(spark, "date"), k=5).collect()}
    assert set(out) == {3}  # only the doc containing the rare term


def test_bm25_repeated_query_terms_count_once(spark, corpus):
    a = bm25_topk(corpus, _q(spark, "apple"), k=5).collect()
    b = bm25_topk(corpus, _q(spark, "apple apple APPLE"), k=5).collect()
    assert sorted((r.doc_id, r.score_nano) for r in a) == sorted(
        (r.doc_id, r.score_nano) for r in b
    )


def test_bm25_deterministic_integer_scores(spark, corpus):
    a = bm25_topk(corpus, _q(spark, "apple banana cherry"), k=5)
    b = bm25_topk(corpus, _q(spark, "apple banana cherry"), k=5)
    assert a.collect() == b.collect()
    assert dict(a.dtypes)["score_nano"] == "bigint"


def test_bm25_broadcasts_query_terms(spark, corpus):
    plan = (
        bm25_topk(corpus, _q(spark, "apple"), k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_rrf_fusion_semantics(spark):
    lex = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2), (1, 30, 3)], "query_id int, doc_id int, rank int"
    )
    vec = spark.createDataFrame(
        [(1, 20, 1), (1, 40, 2)], "query_id int, doc_id int, rank int"
    )
    out = {r.doc_id: r for r in rrf_fuse([("l", lex), ("v", vec)], k0=60).collect()}
    assert set(out) == {10, 20, 30, 40}
    assert out[20].n_systems == 2 and out[10].n_systems == 1
    assert out[20].rank == 1  # appears in both lists -> wins
    # exact integer RRF contributions: 1e9//61 etc. via floor
    assert out[20].rrf_nano == 10**9 // 61 + 10**9 // 62
    assert out[10].rrf_nano == 10**9 // 61
    with pytest.raises(ValueError):
        rrf_fuse([])

class TestMmrRerank:
    def _run(self, spark, cand_rows, pair_rows, **kw):
        from olist_snowflake_dbt_spark.operators.retrieval import mmr_rerank

        cand = spark.createDataFrame(
            cand_rows, "query_id long, doc_id long, rel_nano long"
        )
        pair = spark.createDataFrame(
            pair_rows, "query_id long, doc_a long, doc_b long, sim_nano long"
        )
        out = mmr_rerank(cand, pair, **kw).collect()
        return {(r.query_id, r.rank): (r.doc_id, r.mmr_nano) for r in out}

    def test_rank1_is_pure_relevance_and_diversity_demotes_neardup(self, spark):
        # doc 2 is the near-duplicate of top hit 1 (sim .99); doc 3 is
        # less relevant but diverse. Relevance order: 1, 2, 3 — MMR must
        # pick 1, then 3 (7*900-3*990 < 7*800-3*100), then 2.
        sym = lambda a, b, s: [(0, a, b, s), (0, b, a, s)]  # noqa: E731
        got = self._run(
            spark,
            [(0, 1, 1000), (0, 2, 900), (0, 3, 800)],
            sym(1, 2, 990) + sym(1, 3, 100) + sym(2, 3, 120),
            k=3,
        )
        assert got[(0, 1)] == (1, 7000)
        assert got[(0, 2)] == (3, 7 * 800 - 3 * 100)
        assert got[(0, 3)][0] == 2

    def test_truncates_when_fewer_candidates_than_k(self, spark):
        got = self._run(spark, [(0, 5, 100)], [], k=3)
        assert got == {(0, 1): (5, 700)}

    def test_tiebreak_prefers_smaller_doc_id(self, spark):
        got = self._run(
            spark, [(0, 9, 500), (0, 4, 500)], [], k=1
        )
        assert got[(0, 1)][0] == 4

    def test_lambda_one_is_relevance_order(self, spark):
        sym = lambda a, b, s: [(0, a, b, s), (0, b, a, s)]  # noqa: E731
        got = self._run(
            spark,
            [(0, 1, 1000), (0, 2, 900), (0, 3, 800)],
            sym(1, 2, 999999999) + sym(1, 3, 999999999) + sym(2, 3, 999999999),
            k=3, lam_num=10, lam_den=10,
        )
        assert [got[(0, r)][0] for r in (1, 2, 3)] == [1, 2, 3]

    def test_rejects_bad_lambda(self, spark):
        from olist_snowflake_dbt_spark.operators.retrieval import mmr_rerank

        import pytest as _pytest

        with _pytest.raises(ValueError):
            mmr_rerank(None, None, lam_num=0)
