"""Round-15 cache hygiene: operator persists are session-releasable.

Round-14's hub-frame persists (tf-idf census, BM25 tf hub, rank
projections, span-dedup gram frames, …) had no unpersist — in a
long-lived library session every operator call leaked a cached frame
until ``clearCache()`` (r14 verdict "What's wrong" #2). Operators now
register every such persist with ``operators._cache.scoped_persist``;
``release_operator_caches(spark)`` frees them all. These tests pin:

1. a 2-operator session accumulates cached RDDs, release drops them to
   the pre-call count (no cached frame outlives the caller's release);
2. releasing does not change results — a released frame recomputes
   through lineage bit-identically;
3. release is idempotent and safe after ``clearCache()``.
"""

from __future__ import annotations

from olist_snowflake_dbt_spark.operators import retrieval, text
from olist_snowflake_dbt_spark.operators._cache import (
    release_operator_caches,
    scoped_persist,
)


def _n_cached(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def _docs(spark):
    rows = [(i, f"alpha beta gamma doc {i} " + "common words " * 3)
            for i in range(40)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_release_frees_every_operator_persist(spark):
    spark.catalog.clearCache()
    release_operator_caches(spark)
    base = _n_cached(spark)

    docs = _docs(spark)
    r1 = text.tfidf_topk(docs, "text", "doc_id", k=3)
    r1.count()  # fill the tf hub cache
    queries = spark.createDataFrame(
        [(1, "alpha beta")], "query_id long, query_text string"
    )
    r2 = retrieval.bm25_topk(docs, queries)
    r2.count()
    assert _n_cached(spark) > base, "operators should have cached hub frames"

    released = release_operator_caches(spark)
    assert released >= 2
    assert _n_cached(spark) == base, "release must drop every operator cache"


def test_release_preserves_results(spark):
    spark.catalog.clearCache()
    release_operator_caches(spark)
    docs = _docs(spark)
    out = text.tfidf_topk(docs, "text", "doc_id", k=3)
    before = sorted(map(tuple, out.collect()))
    release_operator_caches(spark)
    # the returned frame recomputes through lineage after release
    after = sorted(map(tuple, out.collect()))
    assert before == after
    release_operator_caches(spark)


def test_release_idempotent_and_clearcache_safe(spark):
    docs = _docs(spark)
    hub = scoped_persist(docs.select("doc_id"))
    hub.count()
    spark.catalog.clearCache()  # the bench's between-queries hygiene
    assert release_operator_caches(spark) >= 1  # no-op unpersists, no raise
    assert release_operator_caches(spark) == 0  # registry drained
