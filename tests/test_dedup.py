from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olist_snowflake_dbt_spark.operators.dedup import (
    drop_from_pairs,
    embedding_cosine_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from olist_snowflake_dbt_spark.sources.readers import read_table


@pytest.fixture(scope="module")
def planted(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    dup = docs.filter(F.col("doc_id") % 50 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000)
    return docs.unionByName(dup).cache()


def test_exact_dedup_removes_planted(spark, planted):
    base = planted.filter(F.col("doc_id") < 1_000_000).count()
    assert exact_dedup(planted, "text", "doc_id").count() == base
    # survivor of each dup pair is the smaller id
    kept_ids = {r.doc_id for r in exact_dedup(planted, "text", "doc_id").collect()}
    assert all(i < 1_000_000 for i in kept_ids)


def test_exact_dedup_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello,  World!"), (2, "hello world"), (3, "different")],
        "doc_id long, text string")
    assert exact_dedup(df, "text", "doc_id").count() == 2


def test_ngram_jaccard_identical_pairs_score_one(spark, planted):
    pairs = ngram_jaccard_pairs(planted, "text", "doc_id", 3, 0.5)
    planted_pairs = pairs.filter(F.col("id_b") >= 1_000_000).collect()
    # every planted duplicate is found with jaccard exactly 1.0
    assert len(planted_pairs) >= planted.filter(F.col("doc_id") >= 1_000_000).count()
    for p in planted_pairs:
        if p.id_b == p.id_a + 1_000_000:
            assert p.jaccard == 1.0


def test_minhash_recall_against_exact(spark, planted):
    """MinHash-LSH must find (almost) everything exact Jaccard ≥ 0.6 finds."""
    exact = {(r.id_a, r.id_b)
             for r in ngram_jaccard_pairs(planted, "text", "doc_id", 3, 0.6).collect()}
    approx = {(r.id_a, r.id_b)
              for r in minhash_lsh_pairs(planted, "text", "doc_id",
                                         n=3, num_hashes=64, bands=16,
                                         threshold=0.5).collect()}
    assert exact, "sanity: planted dups must produce exact pairs"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"LSH recall too low: {recall}"


def test_simhash_finds_planted_dups(spark, planted):
    pairs = simhash_pairs(planted, "text", "doc_id", max_hamming=3)
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    expected = {(i, i + 1_000_000)
                for (i,) in planted.filter(F.col("doc_id") >= 1_000_000)
                .select((F.col("doc_id") - 1_000_000).alias("i")).collect()}
    # identical docs have identical simhash → hamming 0 → always found
    assert expected <= found


def test_embedding_cosine_pairs_planted(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    dup = emb.filter(F.col("vec_id") % 100 == 0).withColumn(
        "vec_id", F.col("vec_id") + 1_000_000)
    e2 = emb.unionByName(dup)
    pairs = embedding_cosine_pairs(e2, "embedding", "vec_id", 0.99).collect()
    planted_n = dup.count()
    exact_pairs = [p for p in pairs if p.id_b == p.id_a + 1_000_000]
    assert len(exact_pairs) == planted_n
    assert all(abs(p.cosine - 1.0) < 1e-12 for p in exact_pairs)


def test_blocked_cosine_adaptive_exchange(spark):
    """Round-12 adaptive block repartition: the probe-side exchange on
    the block key fires only when the input arrives NARROWER than the
    session parallelism (the collapse case it fixes); an already-wide
    input skips it (the sf0.1 dedup_semantic regression), and the
    explicit flags force either way. Results identical in all modes."""
    rows = [(i, [float(i % 5), 1.0, 0.5], i % 3) for i in range(60)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, blk int"
    )
    narrow = df.coalesce(1)
    wide = df.repartition(spark.sparkContext.defaultParallelism)

    def plan(src, **kw):
        out = embedding_cosine_pairs(
            src, "embedding", "vec_id", 0.99, block_col="blk", **kw
        )
        return out, out._jdf.queryExecution().executedPlan().toString()

    auto_narrow, p1 = plan(narrow)
    auto_wide, p2 = plan(wide)
    forced_off, p3 = plan(narrow, block_shuffle=False)
    # the operator's own exchange is REPARTITION_BY_COL; the join may
    # add its own ENSURE_REQUIREMENTS exchange, which is not ours
    assert "REPARTITION_BY_COL" in p1  # narrow → exchange fires
    assert "REPARTITION_BY_COL" not in p2  # wide → skipped
    assert "REPARTITION_BY_COL" not in p3  # forced off
    ref = sorted(map(tuple, auto_narrow.collect()))
    assert ref == sorted(map(tuple, auto_wide.collect()))
    assert ref == sorted(map(tuple, forced_off.collect()))
    assert len(ref) > 0


def test_drop_from_pairs(spark, planted):
    pairs = ngram_jaccard_pairs(planted, "text", "doc_id", 3, 0.99)
    survivors = drop_from_pairs(planted, "doc_id", pairs)
    # all planted clones (id_b side of a 1.0-jaccard pair) are dropped
    assert survivors.filter(F.col("doc_id") >= 1_000_000).count() == 0


def test_connected_components_chains(spark):
    from olist_snowflake_dbt_spark.operators.dedup import connected_components

    # two components: {1,2,3,4} via a chain, {10,11}; star-linkage would
    # miss that 2 and 3 belong with 1 when pairs skip (1,2)
    pairs = spark.createDataFrame(
        [(3, 4), (2, 3), (1, 2), (10, 11)], "id_a long, id_b long"
    )
    got = {
        (r.node, r.component) for r in connected_components(pairs).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}


def test_dedup_by_components_transitive(spark):
    from olist_snowflake_dbt_spark.operators.dedup import (
        dedup_by_components,
        drop_from_pairs,
    )

    df = spark.createDataFrame([(i, f"d{i}") for i in [1, 2, 3, 9]],
                               "doc_id long, text string")
    # chain 1~3 via (1,3) and 2~3 via (2,3): component {1,2,3}, 9 alone
    pairs = spark.createDataFrame([(1, 3), (2, 3)], "id_a long, id_b long")
    exact = {r.doc_id for r in dedup_by_components(df, "doc_id", pairs).collect()}
    assert exact == {1, 9}
    # star-linkage keeps 2 as well — documents the approximation
    star = {r.doc_id for r in drop_from_pairs(df, "doc_id", pairs).collect()}
    assert star == {1, 2, 9}


def test_dedup_by_components_on_planted(spark, planted):
    from olist_snowflake_dbt_spark.operators.dedup import (
        dedup_by_components,
        ngram_jaccard_pairs,
    )

    pairs = ngram_jaccard_pairs(planted, "text", "doc_id", 3, 0.99)
    survivors = dedup_by_components(planted, "doc_id", pairs)
    assert survivors.filter(F.col("doc_id") >= 1_000_000).count() == 0


def test_containment_catches_half_docs(spark, sf_dir):
    from olist_snowflake_dbt_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    halves = docs.filter(F.col("doc_id") % 40 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.expr("substr(text, 1, CAST(length(text)/2 AS INT))").alias("text"),
    )
    both = docs.unionByName(halves)
    cont = containment_pairs(both, "text", "doc_id", 3, 0.8)
    planted = cont.filter(
        F.col("id_b") == F.col("id_a") + 2_000_000
    ).count()
    n_halves = halves.count()
    # nearly every half-doc is contained in its original (a few docs are
    # so short that halving leaves < 3 words -> degenerate shingles)
    assert planted >= n_halves * 0.8
    # symmetric Jaccard at the same threshold misses these by design
    jac = ngram_jaccard_pairs(both, "text", "doc_id", 3, 0.8)
    jac_planted = jac.filter(F.col("id_b") == F.col("id_a") + 2_000_000).count()
    assert jac_planted < planted


def test_connected_components_nonconvergence_raises(spark):
    from olist_snowflake_dbt_spark.operators.dedup import connected_components

    # a 6-node path needs ~5 rounds; max_iter=1 cannot reach fixed point
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "id_a long, id_b long"
    )
    import pytest

    with pytest.raises(RuntimeError, match="not converged"):
        connected_components(pairs, max_iter=1)
    # strict=False returns the partial labeling with a warning instead
    import warnings

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        partial = connected_components(pairs, max_iter=1, strict=False)
        assert any("not converged" in str(x.message) for x in w)
    assert partial.count() == 6
    # and with enough rounds the same edges converge exactly
    full = connected_components(pairs, max_iter=10)
    assert {r.component for r in full.collect()} == {1}


def test_winnow_pairs_find_planted(spark, planted):
    from olist_snowflake_dbt_spark.operators.dedup import (
        winnow_fingerprints,
        winnow_pairs,
    )

    # identical planted copies share EVERY winnowed fingerprint
    pairs = winnow_pairs(planted, "text", "doc_id", n=3, window=4, min_shared=2)
    found = {
        (r.id_a, r.id_b) for r in pairs.collect() if r.id_b >= 1_000_000
    }
    want = {
        (r.doc_id, r.doc_id + 1_000_000)
        for r in planted.filter("doc_id % 50 = 0 and doc_id < 1000000").collect()
    }
    assert want <= found
    # winnowing density: the fingerprint set is a strict subset of the
    # shingle set, roughly 2/(w+1) of it
    fp = winnow_fingerprints(planted, "text", "doc_id", 3, 4)
    n_docs = planted.count()
    avg_fp = fp.count() / n_docs
    from olist_snowflake_dbt_spark.functions.text import words
    from pyspark.sql import functions as F

    avg_shingles = (
        planted.select(F.size(words("text")).alias("k")).agg(F.avg("k")).collect()[0][0]
    )
    assert avg_fp < 0.7 * avg_shingles  # far sparser than full shingling


def test_dedup_family_edge_docs(spark):
    # empty text, punctuation-only (words == []), single word (< n), and
    # a normal doc: no operator may crash, and degenerate docs must not
    # fabricate pairs with normal ones
    from olist_snowflake_dbt_spark.operators.dedup import (
        minhash_lsh_pairs,
        simhash_pairs,
        winnow_pairs,
    )

    df = spark.createDataFrame(
        [
            (1, ""),
            (2, "?!... --- !!!"),
            (3, "solitary"),
            (4, "a perfectly ordinary document about nothing much at all"),
            (5, "a perfectly ordinary document about nothing much at all"),
        ],
        "doc_id long, text string",
    )
    mh = minhash_lsh_pairs(df, "text", "doc_id", n=3, num_hashes=64, bands=16,
                           threshold=0.5)
    assert {(r.id_a, r.id_b) for r in mh.collect()} == {(4, 5)}
    sh = {(r.id_a, r.id_b) for r in simhash_pairs(df, "text", "doc_id").collect()}
    # the two identical docs always collide; token-less docs (1, 2) share
    # the empty-token signature by design (documented in simhash_pairs)
    assert (4, 5) in sh
    assert all(a in (1, 2) and b in (1, 2) for a, b in sh - {(4, 5)})
    wn = winnow_pairs(df, "text", "doc_id", min_shared=1)
    assert {(r.id_a, r.id_b) for r in wn.collect()} == {(4, 5)}


def test_portable_hash60_cross_engine_property(spark):
    # the whole portable-oracle edifice rests on this identity: Spark
    # conv(substr(md5(x),1,15),16,10)::bigint == DuckDB
    # CAST('0x'||substr(md5(x),1,15) AS BIGINT), for ANY utf-8 string
    import duckdb
    from pyspark.sql import functions as F

    from olist_snowflake_dbt_spark.functions.hashing import md5_part60

    samples = [
        "", " ", "hello", "héllo wörld", "中文文本", "emoji 🎉🚀", "a" * 5000,
        "tab\tnewline\nquote'\"backslash\\", "ß É ǅ", "İstanbul",
    ] + [f"doc-{i}-{'x' * (i % 97)}" for i in range(200)]
    sdf = spark.createDataFrame([(s,) for s in samples], "s string")
    md = F.md5(F.col("s").cast("binary"))
    got = {
        r.s: (r.h0, r.h1)
        for r in sdf.select(
            "s",
            md5_part60(md, 0).alias("h0"),
            md5_part60(md, 1).alias("h1"),
        ).collect()
    }
    con = duckdb.connect()
    for s in samples:
        d0, d1 = con.execute(
            "SELECT CAST('0x' || substr(md5(?), 1, 15) AS BIGINT),"
            "       CAST('0x' || substr(md5(?), 16, 15) AS BIGINT)",
            [s, s],
        ).fetchone()
        assert got[s] == (d0, d1), s


def test_fuzzy_pairs_recovers_planted_typos(spark):
    from olist_snowflake_dbt_spark.operators.dedup import fuzzy_pairs

    corpus = spark.createDataFrame(
        [
            (1, "green widget"),
            (2, "green bolt"),
            (3, "red widget"),
            (4, "green widgets deluxe"),
        ],
        ["pid", "name"],
    )
    probes = spark.createDataFrame(
        [(101, "green widgex"), (102, "purple thing")], ["probe_id", "name"]
    )
    rows = fuzzy_pairs(
        corpus, probes, text_col="name", id_col="pid", max_dist=2
    ).collect()
    got = {(r["probe_id"], r["pid"]): r["edit_distance"] for r in rows}
    # typo'd probe matches its source within 1 edit
    assert got[(101, 1)] == 1
    # "green bolt" shares the block but is >2 edits away; "red widget"
    # is close in distance but blocked out by first word — both absent
    assert (101, 2) not in got and (101, 3) not in got
    # length band (±2) excludes "green widgets deluxe" before any DP
    assert (101, 4) not in got
    # probe with no block partner matches nothing
    assert not any(p == 102 for p, _ in got)


def test_subdoc_chunks_plan_and_conservation(spark, sf_dir):
    """Plan: hash-keyed winner aggregate + join, never a cartesian.
    Semantics: every chunk is kept somewhere exactly once per distinct
    chunk — total kept == number of distinct chunks in the corpus."""
    from olist_snowflake_dbt_spark.queries import QUERIES, _t
    from pyspark.sql import functions as F

    df = QUERIES["dedup_subdoc_chunks"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan

    rows = df.collect()
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    ws = F.split(F.col("text"), " ")
    n_chunks_col = F.ceil(F.size(ws) / F.lit(8.0)).cast("bigint")
    distinct_chunks = (
        docs.select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), n_chunks_col)).alias("idx"),
            ws.alias("w"),
        )
        .select(F.array_join(F.slice("w", (F.col("idx") - 1) * 8 + 1, 8), " ").alias("c"))
        .distinct()
        .count()
    )
    assert sum(r.n_kept for r in rows) == distinct_chunks
    assert all(0 <= r.n_kept <= r.n_chunks for r in rows)


def test_semantic_dedup_drops_planted_dups_within_clusters(spark, sf_dir):
    """SemDeDup composition: every planted exact duplicate (same vector,
    id + 1e6) must be dropped — identical vectors share a k-means
    cluster and score cosine 1.0 — while all original ids survive and
    no cross-cluster comparison ever happens (pairs are cluster-blocked
    equi-joins, so the plan has no CartesianProduct)."""
    from olist_snowflake_dbt_spark.operators.clustering import kmeans_lloyd
    from olist_snowflake_dbt_spark.operators.dedup import semantic_dedup
    from olist_snowflake_dbt_spark.queries import QUERIES, _t

    import pyspark.sql.functions as F

    emb = _t(spark, sf_dir, "embeddings")
    dup = (
        emb.filter(F.col("vec_id") % 100 == 0)
        .withColumn("vec_id", F.col("vec_id") + 1000000)
    )
    planted = emb.unionByName(dup)
    assign = kmeans_lloyd(planted, "embedding", "vec_id", k=8, iters=2)
    e = planted.join(assign.select("vec_id", "cluster"), "vec_id").select(
        "vec_id", "embedding", "cluster"
    )
    out = semantic_dedup(e, "embedding", "vec_id", "cluster", 0.95)
    survivors = {r.vec_id for r in out.select("vec_id").collect()}
    originals = {r.vec_id for r in emb.select("vec_id").collect()}
    planted_ids = {r.vec_id for r in dup.select("vec_id").collect()}
    assert planted_ids.isdisjoint(survivors)  # every planted dup dropped
    assert originals <= survivors | planted_ids  # no original lost
    plan = QUERIES["dedup_semantic"](spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_incremental_dedup_rejects_standing_and_within_batch_dups(spark):
    """incremental_dedup admits exactly: fingerprint-new batch rows,
    one (smallest-id) representative per within-batch duplicate set."""
    from olist_snowflake_dbt_spark.functions.text import fingerprint
    from olist_snowflake_dbt_spark.operators.dedup import incremental_dedup

    import pyspark.sql.functions as F

    standing_docs = spark.createDataFrame(
        [(0, "alpha text"), (2, "beta text")], "doc_id long, text string"
    )
    standing = standing_docs.select(
        fingerprint("text").alias("doc_fingerprint")
    ).dropDuplicates()
    batch = spark.createDataFrame(
        [
            (11, "gamma text"),          # new -> admitted
            (13, "ALPHA  text"),         # normalizes to standing alpha -> rejected
            (15, "delta text"),          # new, dup'd below -> admitted (min id)
            (17, "delta  TEXT"),         # within-batch dup of 15 -> rejected
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id for r in incremental_dedup(batch, standing, "text", "doc_id").collect()}
    assert got == {11, 15}
    # idempotence of admission: re-running the SAME batch against the
    # standing set grown by the survivors' fingerprints admits nothing
    survivors = incremental_dedup(batch, standing, "text", "doc_id")
    grown = standing.unionByName(
        survivors.select(fingerprint("text").alias("doc_fingerprint"))
    ).dropDuplicates()
    assert incremental_dedup(batch, grown, "text", "doc_id").count() == 0


def test_duplicated_span_stats_hand_checked(spark):
    from olist_snowflake_dbt_spark.operators.dedup import duplicated_span_stats

    # d1/d2 share the 3-gram "a b c" once each; d3 repeats "x y z" twice
    # WITHIN itself (overlapping coverage 1..5); d4 is unique; d5 short.
    df = spark.createDataFrame(
        [
            (1, "a b c p q"),
            (2, "m a b c n"),
            (3, "x y z x y z"),
            (4, "u v w r s"),
            (5, "t u"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_words, r.n_dup_words, r.dup_ratio)
        for r in duplicated_span_stats(df, "text", "doc_id", n=3, min_freq=2).collect()
    }
    assert got[1] == (5, 3, 0.6)       # positions 1-3 covered
    assert got[2] == (5, 3, 0.6)       # positions 2-4 covered
    # d3: "x y z" at pos 1 and 4 (freq 2) + "z x y"/"y z x" unique →
    # covered {1..3} ∪ {4..6} = all 6
    assert got[3] == (6, 6, 1.0)
    assert got[4] == (5, 0, 0.0)
    assert got[5] == (2, 0, 0.0)       # shorter than n: no grams, no spans


def test_duplicated_span_stats_planted_full_cover(spark, planted):
    from olist_snowflake_dbt_spark.operators.dedup import duplicated_span_stats

    out = duplicated_span_stats(planted, "text", "doc_id", n=5, min_freq=2)
    planted_pairs = out.filter(
        (F.col("doc_id") % 50 == 0) | (F.col("doc_id") >= 1_000_000)
    )
    # every planted duplicate (and its original) with ≥5 words is fully
    # covered by duplicated 5-grams — dup_ratio exactly 1.0
    bad = planted_pairs.filter(
        (F.col("n_words") >= 5) & (F.col("dup_ratio") < 1.0)
    ).count()
    assert bad == 0


def test_remove_duplicated_spans_hand_checked(spark):
    from olist_snowflake_dbt_spark.operators.dedup import remove_duplicated_spans

    df = spark.createDataFrame(
        [
            (1, "a b c p q"),
            (2, "m a b c n"),
            (3, "x y z x y z"),
            (4, "u v w r s"),
            (5, "t u"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_kept, r.clean_text)
        for r in remove_duplicated_spans(df, "text", "doc_id", n=3, min_freq=2).collect()
    }
    assert got[1] == (2, "p q")
    assert got[2] == (2, "m n")
    assert got[3] == (0, "")          # fully covered → empty survivor
    assert got[4] == (5, "u v w r s")
    assert got[5] == (2, "t u")       # shorter than n: untouched


def test_span_removal_consistent_with_span_stats(spark, planted):
    from olist_snowflake_dbt_spark.operators.dedup import (
        duplicated_span_stats,
        remove_duplicated_spans,
    )

    stats = duplicated_span_stats(planted, "text", "doc_id", n=5, min_freq=2)
    cut = remove_duplicated_spans(planted, "text", "doc_id", n=5, min_freq=2)
    joined = stats.join(cut.select("doc_id", "n_kept"), "doc_id")
    # kept + covered positions partition the word sequence exactly
    bad = joined.filter(
        F.col("n_kept") + F.col("n_dup_words") != F.col("n_words")
    ).count()
    assert bad == 0


class TestIncrementalMinhashDedup:
    """Round-12 incremental near-dup admission against a standing
    band-key index."""

    def _bands(self, spark, rows):
        from olist_snowflake_dbt_spark.operators.dedup import minhash_banded

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return minhash_banded(df, "text", "doc_id", 3, 64, 16).select(
            F.col("__band").alias("band")
        )

    def test_recrawl_rejected_fresh_admitted(self, spark):
        from olist_snowflake_dbt_spark.operators.dedup import (
            incremental_minhash_dedup,
        )

        standing_rows = [
            (1, "the quick brown fox jumps over the lazy dog every day"),
            (2, "entirely different standing document about spark engines"),
        ]
        batch = spark.createDataFrame(
            [
                # exact re-crawl of standing doc 1 -> rejected
                (10, "the quick brown fox jumps over the lazy dog every day"),
                # genuinely new -> admitted
                (11, "a completely novel document with fresh content here"),
            ],
            "doc_id long, text string",
        )
        admitted = incremental_minhash_dedup(
            batch, self._bands(spark, standing_rows), "text", "doc_id"
        )
        assert {r.doc_id for r in admitted.collect()} == {11}

    def test_batch_internal_smaller_id_wins(self, spark):
        from olist_snowflake_dbt_spark.operators.dedup import (
            incremental_minhash_dedup,
        )

        batch = spark.createDataFrame(
            [
                (20, "some document text that repeats inside this batch"),
                (21, "some document text that repeats inside this batch"),
                (22, "an unrelated singleton document in the same batch"),
            ],
            "doc_id long, text string",
        )
        standing = self._bands(
            spark, [(1, "nothing in the standing corpus matches these")]
        )
        admitted = incremental_minhash_dedup(
            batch, standing, "text", "doc_id"
        )
        assert {r.doc_id for r in admitted.collect()} == {20, 22}

    def test_empty_doc_admitted_not_lost(self, spark):
        """A document with no [a-z0-9] tokens has no bands — it must be
        ADMITTED (no collision evidence), not silently dropped."""
        from olist_snowflake_dbt_spark.operators.dedup import (
            incremental_minhash_dedup,
        )

        batch = spark.createDataFrame(
            [(30, "!!! ??? ..."), (31, "real words in a real document")],
            "doc_id long, text string",
        )
        standing = self._bands(spark, [(1, "real words in a real document")])
        admitted = incremental_minhash_dedup(
            batch, standing, "text", "doc_id"
        )
        assert {r.doc_id for r in admitted.collect()} == {30}

    def test_state_is_bands_per_doc(self, spark):
        """The standing state the invariant needs is exactly `bands`
        keys per (shingled) document — the growth-without-rescan
        contract."""
        rows = [(i, f"document number {i} with shared filler words") for i in range(5)]
        bands = self._bands(spark, rows)
        assert bands.count() == 5 * 16

    def test_appending_admitted_bands_keeps_invariant(self, spark):
        """The growth loop: after appending the admitted rows' bands to
        the standing index, replaying the SAME batch admits only the
        band-less (zero-shingle) docs — every banded row now collides
        with its own standing entry. This is the invariant that lets a
        corpus grow without reprocessing itself."""
        from olist_snowflake_dbt_spark.operators.dedup import (
            incremental_minhash_dedup,
            minhash_banded,
        )

        batch = spark.createDataFrame(
            [
                (40, "first unique document about distributed joins"),
                (41, "second unique document about window functions"),
                (42, "???"),  # zero shingles -> no bands, always admitted
            ],
            "doc_id long, text string",
        )
        standing = self._bands(
            spark, [(1, "standing corpus text unrelated to the batch")]
        )
        admitted = incremental_minhash_dedup(
            batch, standing, "text", "doc_id"
        )
        assert {r.doc_id for r in admitted.collect()} == {40, 41, 42}
        grown = standing.unionByName(
            minhash_banded(admitted, "text", "doc_id", 3, 64, 16).select(
                F.col("__band").alias("band")
            )
        )
        replay = incremental_minhash_dedup(batch, grown, "text", "doc_id")
        assert {r.doc_id for r in replay.collect()} == {42}


def test_containment_kmv_prescreen_matches_exact(spark, sf_dir):
    """Round-13 KMV pre-screen: on the planted half-doc fixture the
    prescreened operator must return EXACTLY the exact operator's
    pairs (same ids, same containment values) — the sketch only gates
    which pairs pay for verification, never what is emitted."""
    from olist_snowflake_dbt_spark.operators.dedup import (
        containment_pairs,
        containment_pairs_kmv_prescreen,
    )

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    halves = docs.filter(F.col("doc_id") % 40 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.expr("substr(text, 1, CAST(length(text)/2 AS INT))").alias("text"),
    )
    both = docs.unionByName(halves)
    exact = {
        (r.id_a, r.id_b, round(r.containment, 9))
        for r in containment_pairs(both, "text", "doc_id", 3, 0.8).collect()
    }
    fast = {
        (r.id_a, r.id_b, round(r.containment, 9))
        for r in containment_pairs_kmv_prescreen(
            both, "text", "doc_id", 3, 0.8
        ).collect()
    }
    assert fast == exact and len(exact) > 0


def test_containment_kmv_prescreen_planted_recall(spark, sf_dir):
    """Planted-recall pin: every half-doc/original pair the EXACT path
    finds must survive the sketch gate (recall 1.0 on this fixture —
    the deterministic md5-free xxhash sampling makes this replayable,
    not flaky)."""
    from olist_snowflake_dbt_spark.operators.dedup import (
        containment_pairs,
        containment_pairs_kmv_prescreen,
    )

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    halves = docs.filter(F.col("doc_id") % 40 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.expr("substr(text, 1, CAST(length(text)/2 AS INT))").alias("text"),
    )
    both = docs.unionByName(halves)
    exact_planted = {
        (r.id_a, r.id_b)
        for r in containment_pairs(both, "text", "doc_id", 3, 0.8)
        .filter(F.col("id_b") == F.col("id_a") + 2_000_000)
        .collect()
    }
    fast_planted = {
        (r.id_a, r.id_b)
        for r in containment_pairs_kmv_prescreen(
            both, "text", "doc_id", 3, 0.8
        )
        .filter(F.col("id_b") == F.col("id_a") + 2_000_000)
        .collect()
    }
    assert exact_planted and fast_planted >= exact_planted


def test_containment_kmv_prescreen_guards(spark):
    import pytest as _pytest

    from olist_snowflake_dbt_spark.operators.dedup import (
        containment_pairs_kmv_prescreen,
    )

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="threshold"):
        containment_pairs_kmv_prescreen(df, "text", "doc_id", threshold=0.0)
    with _pytest.raises(ValueError, match="k must be"):
        containment_pairs_kmv_prescreen(df, "text", "doc_id", k=4)


# ---------------------------------------------------------------------
# round 13: one-permutation-hashing MinHash (OPH + rotation densification)
# ---------------------------------------------------------------------


def test_oph_recall_against_exact(spark, planted):
    """OPH-LSH must find (almost) everything exact Jaccard ≥ 0.6 finds —
    the same bar as classic k-mins MinHash."""
    from olist_snowflake_dbt_spark.operators.dedup import oph_minhash_pairs

    exact = {(r.id_a, r.id_b)
             for r in ngram_jaccard_pairs(planted, "text", "doc_id", 3, 0.6).collect()}
    approx = {(r.id_a, r.id_b)
              for r in oph_minhash_pairs(planted, "text", "doc_id",
                                         n=3, num_bins=64, bands=16,
                                         threshold=0.5).collect()}
    assert exact, "sanity: planted dups must produce exact pairs"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"OPH recall too low: {recall}"


def test_oph_signatures_exact_duplicates_and_densification(spark):
    from olist_snowflake_dbt_spark.operators.dedup import oph_minhash_signatures

    # a 3-word doc has ONE shingle → exactly one occupied bin; rotation
    # densification must still fill all 64 slots, every slot decoding
    # to (value + distance·2^31) from that single bin
    df = spark.createDataFrame(
        [(1, "tiny shingle doc"), (2, "tiny shingle doc"), (3, "")],
        "doc_id long, text string",
    )
    rows = {r["__id"]: r["__sig"] for r in
            oph_minhash_signatures(df, "text", "doc_id").collect()}
    assert 3 not in rows, "token-less doc must produce no signature row"
    assert rows[1] == rows[2], "exact duplicates must share the full signature"
    sig = rows[1]
    assert len(sig) == 64 and all(v is not None for v in sig)
    c = 1 << 31
    vals = {v % c for v in sig}
    assert len(vals) == 1, "one occupied bin ⇒ one base value everywhere"
    dists = sorted(v // c for v in sig)
    # the occupied bin serves distance 0; circular borrow covers 0..63
    assert dists == list(range(64))


def test_oph_signatures_partitioning_invariance(spark, planted):
    from olist_snowflake_dbt_spark.operators.dedup import oph_minhash_signatures

    base = {r["__id"]: r["__sig"] for r in
            oph_minhash_signatures(planted, "text", "doc_id").collect()}
    re = {r["__id"]: r["__sig"] for r in
          oph_minhash_signatures(planted.repartition(7), "text", "doc_id").collect()}
    assert base == re


class TestLongestDupSpanLadder:
    """Length-doubling ExactSubstr ladder: span_ge certifies the
    largest rung n0*2^k at which a corpus-duplicated n-gram exists."""

    def _fixture(self, spark):
        shared12 = " ".join(f"alpha{i}" for i in range(12))
        shared6 = " ".join(f"beta{i}" for i in range(6))
        full25 = " ".join(f"gamma{i}" for i in range(25))
        rows = [
            (1, shared12 + " " + " ".join(f"u1x{i}" for i in range(10))),
            (2, " ".join(f"u2x{i}" for i in range(10)) + " " + shared12),
            (3, shared6 + " " + " ".join(f"u3x{i}" for i in range(12))),
            (4, " ".join(f"u4x{i}" for i in range(12)) + " " + shared6),
            (5, " ".join(f"solo{i}" for i in range(30))),
            (6, full25),
            (7, full25),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_rungs_certify_span_lengths(self, spark):
        from olist_snowflake_dbt_spark.operators.dedup import (
            longest_dup_span_ladder,
        )

        out = {
            r.doc_id: (r.n_words, r.span_ge)
            for r in longest_dup_span_ladder(
                self._fixture(spark), "text", "doc_id", n0=5, levels=3
            ).collect()
        }
        # 12-word shared span: 10-gram rung reached, 20 not
        assert out[1] == (22, 10) and out[2] == (22, 10)
        # 6-word shared span: only the 5-gram rung
        assert out[3] == (18, 5) and out[4] == (18, 5)
        # unique doc: no rung
        assert out[5] == (30, 0)
        # identical 25-word docs: the 20-gram rung (top of the ladder)
        assert out[6] == (25, 20) and out[7] == (25, 20)

    def test_level_one_matches_fixed_n_stats(self, spark):
        """The ladder's bottom rung must agree with
        duplicated_span_stats' notion of 'has a duplicated n0-gram'."""
        from olist_snowflake_dbt_spark.operators.dedup import (
            duplicated_span_stats,
            longest_dup_span_ladder,
        )

        df = self._fixture(spark)
        ladder = {
            r.doc_id: r.span_ge > 0
            for r in longest_dup_span_ladder(
                df, "text", "doc_id", n0=5, levels=1
            ).collect()
        }
        fixed = {
            r.doc_id: r.n_dup_words > 0
            for r in duplicated_span_stats(df, "text", "doc_id", n=5).collect()
        }
        assert ladder == fixed
