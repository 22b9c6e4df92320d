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