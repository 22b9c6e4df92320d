"""Skew-stress tests for the dedup path (VERDICT r06 #4).

Adversarial zipfian fixture: a large cluster of boilerplate clones makes
(a) every shingle of the shared text ubiquitous — a hot inverted-index
bucket — and (b) the clones' MinHash signatures near-identical, so most
LSH bands collide into one hot bucket. Uncapped, either blows up as
O(cluster²) in a SINGLE task — the failure mode that stalls a 1000-
executor job on one straggler. These tests assert the actual BOUNDS the
operators enforce (max surviving bucket size), not just recall.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olist_snowflake_dbt_spark.operators.dedup import (
    minhash_banded,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)

BOILER = (
    "this document is provided as is without warranty of any kind either "
    "express or implied including but not limited to fitness for a purpose"
)
PAIR_A = (
    "quantum chemistry simulations require careful basis set selection and "
    "convergence testing across multiple geometries before production runs"
)
PAIR_B = (
    "quantum chemistry simulations require careful basis set selection and "
    "convergence validation across multiple geometries before production runs"
)

N_CLONES = 300
CAP = 50


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, f"{BOILER} clone number {i}") for i in range(N_CLONES)]
    rows += [(9001, PAIR_A), (9002, PAIR_B)]
    rows += [
        (8000 + i, " ".join(f"tok{i}x{j}" for j in range(25))) for i in range(50)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_fixture_is_adversarial_minhash(corpus):
    """Sanity: uncapped, the clone cluster really does create hot LSH
    buckets ≫ the cap (otherwise the capped assertions are vacuous)."""
    sizes = (
        minhash_banded(corpus, "text", "doc_id", n=3, num_hashes=64, bands=16)
        .groupBy("__band")
        .agg(F.count(F.lit(1)).alias("bn"))
    )
    hottest = sizes.agg(F.max("bn")).first()[0]
    # clones share every boilerplate shingle; their band keys collide in
    # the bands untouched by the unique suffix (the suffix perturbs a few
    # bands per doc, so the hottest bucket is slightly under N_CLONES —
    # still an order of magnitude above the cap)
    assert hottest > 4 * CAP, hottest


def test_minhash_hot_bucket_cap_bounds_largest_task(corpus):
    """With max_bucket=CAP every SURVIVING bucket — the unit of work of
    one join task — holds ≤ CAP rows, so the largest task is bounded at
    CAP² comparisons no matter how skewed the corpus is."""
    banded = minhash_banded(corpus, "text", "doc_id", n=3, num_hashes=64, bands=16)
    sizes = banded.groupBy("__band").agg(F.count(F.lit(1)).alias("bn"))
    surviving_max = (
        sizes.filter(F.col("bn") <= CAP).agg(F.max("bn")).first()[0]
    )
    assert surviving_max is not None and surviving_max <= CAP
    # the bound holds end-to-end: the operator's result under the cap
    # can only contain pairs from surviving buckets — far below the
    # uncapped quadratic cluster blow-up
    pairs = minhash_lsh_pairs(
        corpus, "text", "doc_id", n=3, num_hashes=64, bands=16,
        threshold=0.5, max_bucket=CAP,
    )
    n_pairs = pairs.count()
    assert n_pairs < (N_CLONES * (N_CLONES - 1)) // 4, n_pairs


def test_minhash_cap_preserves_non_hot_recall(corpus):
    """Dropping hot buckets must not lose ordinary near-dups: the
    planted pair lives in its own tiny buckets and survives the cap."""
    pairs = minhash_lsh_pairs(
        corpus, "text", "doc_id", n=3, num_hashes=64, bands=16,
        threshold=0.5, max_bucket=CAP,
    )
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (9001, 9002) in found


def test_jaccard_doc_freq_cap_bounds_index_buckets(corpus):
    """max_doc_freq drops ubiquitous shingles BEFORE the self-join: the
    surviving inverted-index bucket sizes (== per-shingle document
    frequency) are all ≤ the cap, bounding the largest join task."""
    from olist_snowflake_dbt_spark.functions.text import (
        shingle_hashes_from_words,
        words,
    )

    shingled = corpus.select(
        F.col("doc_id").alias("__id"), words("text").alias("__ws")
    ).select(
        "__id", shingle_hashes_from_words(F.col("__ws"), 3).alias("__sh")
    ).select("__id", F.explode("__sh").alias("__s"))
    freqs = shingled.groupBy("__s").agg(F.count(F.lit(1)).alias("df"))
    # adversarial for real: boilerplate shingles appear in every clone
    assert freqs.agg(F.max("df")).first()[0] >= N_CLONES
    surviving_max = (
        freqs.filter(F.col("df") <= CAP).agg(F.max("df")).first()[0]
    )
    assert surviving_max <= CAP  # what the capped operator self-joins on

    capped = ngram_jaccard_pairs(
        corpus, "text", "doc_id", n=3, threshold=0.5, max_doc_freq=CAP
    )
    got = {(r.id_a, r.id_b): r.jaccard for r in capped.collect()}
    # clone-cluster pairs matched ONLY via hot shingles are gone...
    assert not any(a < N_CLONES and b < N_CLONES for (a, b) in got)
    # ...while the planted pair survives with its EXACT score: none of
    # its shingles are ubiquitous, so capped == uncapped for it
    exact = ngram_jaccard_pairs(corpus, "text", "doc_id", n=3, threshold=0.5)
    exact_score = {
        (r.id_a, r.id_b): r.jaccard for r in exact.collect()
    }[(9001, 9002)]
    assert got[(9001, 9002)] == pytest.approx(exact_score)


def test_jaccard_default_stays_exact(corpus):
    """max_doc_freq=None must remain the byte-exact oracle path: the
    clone cluster IS returned (quadratically) when uncapped."""
    exact = ngram_jaccard_pairs(corpus, "text", "doc_id", n=3, threshold=0.9)
    n_clone_pairs = exact.filter(
        (F.col("id_a") < N_CLONES) & (F.col("id_b") < N_CLONES)
    ).count()
    assert n_clone_pairs == (N_CLONES * (N_CLONES - 1)) // 2


def test_ann_lsh_hot_bucket_cap_bounds_candidates_keeps_cold_recall(spark):
    """Duplicate-heavy corpora pile near-identical vectors into the SAME
    band buckets (they share every band). The optional max_bucket guard
    drops those buckets before the join — bounding per-query candidate
    work — while queries OUTSIDE the pile keep their true neighbors."""
    import math

    from olist_snowflake_dbt_spark.operators.similarity import ann_lsh_topk

    dim = 8
    # 400 near-identical "hot" vectors + 20 spread-out cold vectors
    hot = [
        (i, [1.0 + (i % 7) * 1e-4] + [0.1] * (dim - 1)) for i in range(400)
    ]
    cold = [
        (1000 + j, [math.cos(j), math.sin(j)] + [float(j % 3)] * (dim - 2))
        for j in range(20)
    ]
    # a planted near-dup pair in the cold region
    cold.append((2001, [math.cos(5), math.sin(5)] + [2.0] * (dim - 2)))
    corpus = spark.createDataFrame(
        hot + cold, "vec_id long, embedding array<double>"
    )
    queries = spark.createDataFrame(
        [cold[5], cold[-1]], "vec_id long, embedding array<double>"
    )

    capped = ann_lsh_topk(
        corpus, queries, dim, k=5, planes=16, bands=4, max_bucket=50
    )
    rows = capped.collect()
    # the cold planted pair still finds each other (their buckets are small)
    got = {(r.query_id, r.neighbor_id) for r in rows if r.rank == 1}
    assert (2001, 1005) in got or (1005, 2001) in got
    # and the hot pile cannot dominate the candidate set: no query's
    # result contains more than k rows, and hot ids (whose buckets were
    # dropped) don't appear as neighbors of cold queries
    assert all(r.neighbor_id >= 1000 for r in rows)


def test_prefix_filter_is_lossless_and_shrinks_the_index(spark, corpus):
    """Round-11 prefix filtering: (a) EXACT same pairs and scores as
    the full inverted-index join at the same threshold — the lossless
    guarantee; (b) the indexed prefix is a strict subset of the full
    index; (c) the ubiquitous boilerplate shingles sort OUT of the
    prefixes (rarest-first canonical order), so the hot buckets that
    motivate max_doc_freq never form."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from olist_snowflake_dbt_spark.operators.dedup import (
        _shingled,
        ngram_jaccard_pairs,
        prefix_filter_jaccard_pairs,
    )

    t = 0.5
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(corpus, "text", "doc_id", 3, t).collect()
    }
    pruned = {
        (r.id_a, r.id_b): r.jaccard
        for r in prefix_filter_jaccard_pairs(
            corpus, "text", "doc_id", 3, t
        ).collect()
    }
    assert pruned == exact and exact  # identical pairs AND scores

    # index-size arithmetic: prefix keeps |d| - ceil(t|d|) + 1 of |d|
    sh = _shingled(corpus, "text", "doc_id", 3).withColumn(
        "__n", F.size("__shingles")
    )
    full_index = sh.agg(F.sum("__n")).first()[0]
    prefix_index = sh.agg(
        F.sum(F.col("__n") - F.ceil(F.lit(t) * F.col("__n")) + 1)
    ).first()[0]
    assert prefix_index < 0.6 * full_index  # strictly smaller at t=0.5

    # hot-bucket COUNT collapses at near-dup thresholds: prefix length
    # is |d|-ceil(t|d|)+1, so at t=0.9 each ~25-shingle clone indexes
    # only its ~3 rarest shingles and the ~24 ubiquitous boilerplate
    # buckets shrink to the one or two the lossless bound requires.
    # (At least ONE hot bucket must survive — the exact join's OUTPUT
    # on this corpus is quadratic by design, so something has to
    # connect the clone cluster.)
    t_hi = 0.9
    ex = sh.select("__id", "__n", F.explode("__shingles").alias("__s"))
    dfreq = ex.groupBy("__s").agg(F.count(F.lit(1)).alias("__df"))
    w = Window.partitionBy("__id").orderBy("__df", "__s")
    plen_hi = F.col("__n") - F.ceil(F.lit(t_hi) * F.col("__n")) + 1
    prefix_buckets = (
        ex.join(dfreq, "__s")
        .withColumn("__pos", F.row_number().over(w))
        .filter(F.col("__pos") <= plen_hi)
        .groupBy("__s")
        .agg(F.count(F.lit(1)).alias("bn"))
    )
    hot_full = dfreq.filter(F.col("__df") >= N_CLONES).count()
    hot_prefix = prefix_buckets.filter(F.col("bn") >= N_CLONES).count()
    assert hot_full >= 10                 # boilerplate IS ubiquitous
    assert 1 <= hot_prefix <= 3           # ...collapsed to the lossless few
    # and t=0.9 results stay exact too (the quadratic clone output)
    hi_exact = ngram_jaccard_pairs(corpus, "text", "doc_id", 3, t_hi)
    hi_pruned = prefix_filter_jaccard_pairs(corpus, "text", "doc_id", 3, t_hi)
    assert hi_pruned.count() == hi_exact.count() >= (N_CLONES * (N_CLONES - 1)) // 2


def test_soft_dedup_weights_exact_under_boilerplate_skew(spark, corpus):
    """The SoftDeDup census join-back has a hot key per boilerplate
    bigram (every clone emits it). The weights must stay EXACT under
    that skew: each clone's bigrams split into the shared-boilerplate
    part (frequency ≈ N_CLONES) and its unique tail, and the expected
    weight is computable in closed form from the corpus itself."""
    from olist_snowflake_dbt_spark.operators.text import soft_dedup_weights

    out = {r.doc_id: r for r in soft_dedup_weights(corpus).collect()}
    # clone i text: BOILER + ' clone number i' — 22 boiler words + 3.
    # Recompute the exact expectation from first principles in python.
    import re as _re

    def grams(text):
        w = _re.findall("[a-z0-9]+", text.lower())
        return [" ".join(w[i:i + 2]) for i in range(len(w) - 1)]

    from collections import Counter

    rows = {r.doc_id: r.text for r in corpus.collect()}
    census = Counter(g for t in rows.values() for g in grams(t))
    for i in (0, 150, 299, 9001, 8000):
        gs = grams(rows[i])
        sum_freq = sum(census[g] for g in gs)
        assert out[i].n_grams == len(gs)
        assert out[i].sum_freq == sum_freq
        assert out[i].weight_nano == (10**9 * len(gs)) // sum_freq
    # boilerplate clones are crushed relative to unique docs
    assert out[0].weight_nano < out[8000].weight_nano // 10
