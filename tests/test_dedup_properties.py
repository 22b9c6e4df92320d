"""Property-based tests (hypothesis) for the dedup operator family —
the invariants that must hold for ANY corpus, not just the fixtures:

- **idempotence**: dedup(dedup(X)) = dedup(X);
- **conservation**: one survivor per distinct fingerprint, survivors
  are a subset of the input, nothing not-duplicated is dropped;
- **permutation/partitioning invariance**: row order and partition
  count never change the surviving set (the keep-first rule is defined
  by id order, not physical order);
- **connected components**: Spark's min-label propagation equals a
  pure-Python union-find on the same edges, for arbitrary small graphs.

Example counts are small — each example pays Spark jobs (mirrors
tests/test_seed_properties.py)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from olist_snowflake_dbt_spark.operators.dedup import (
    connected_components,
    dedup_by_components,
    exact_dedup,
)

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# a small text pool makes cross-row duplicates likely; whitespace/case
# variants must collapse to one fingerprint (normalization contract)
_TEXT_POOL = [
    "the quick brown fox",
    "THE  QUICK   BROWN FOX",
    "lorem ipsum dolor",
    "lorem ipsum dolor ",
    "completely different text",
    "",
]

_corpus_strategy = st.lists(
    st.sampled_from(_TEXT_POOL), min_size=1, max_size=10
)


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


@given(_corpus_strategy)
@settings(**_SETTINGS)
def test_exact_dedup_idempotent_and_conserving(spark, texts):
    df = _df(spark, texts)
    once = exact_dedup(df, "text", "doc_id")
    twice = exact_dedup(once, "text", "doc_id")
    got_once = {(r.doc_id, r.text) for r in once.collect()}
    got_twice = {(r.doc_id, r.text) for r in twice.collect()}
    # idempotence
    assert got_once == got_twice
    # survivors are input rows
    assert got_once <= {(i, t) for i, t in enumerate(texts)}
    # exactly one survivor per normalized fingerprint, none lost
    from olist_snowflake_dbt_spark.functions.text import fingerprint

    n_fingerprints = (
        df.select(fingerprint("text").alias("fp")).distinct().count()
    )
    assert once.count() == n_fingerprints


@given(_corpus_strategy, st.integers(min_value=1, max_value=5))
@settings(**_SETTINGS)
def test_exact_dedup_partitioning_and_order_invariant(spark, texts, nparts):
    base = _df(spark, texts)
    survivors = {
        (r.doc_id, r.text) for r in exact_dedup(base, "text", "doc_id").collect()
    }
    # physical re-layout: different partition count + reversed row order
    shuffled = base.repartition(nparts).sortWithinPartitions(
        "doc_id", ascending=False
    )
    survivors_shuffled = {
        (r.doc_id, r.text)
        for r in exact_dedup(shuffled, "text", "doc_id").collect()
    }
    assert survivors == survivors_shuffled


def _union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    return {n: find(n) for n in parent}


_edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=0, max_value=9),
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=12,
)


@given(_edges_strategy)
@settings(**_SETTINGS)
def test_connected_components_matches_union_find(spark, edges):
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "id_a long, id_b long"
    ).dropDuplicates()
    got = {
        r.node: r.component for r in connected_components(pairs).collect()
    }
    want = _union_find_components(edges)
    # min-label propagation labels by smallest reachable id; union-find
    # with min-root union does the same
    assert got == want


@given(_edges_strategy)
@settings(**_SETTINGS)
def test_dedup_by_components_keeps_one_per_cluster(spark, edges):
    node_ids = sorted({n for e in edges for n in e} | {97, 98, 99})
    df = spark.createDataFrame(
        [(n, f"text_{n}") for n in node_ids], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "id_a long, id_b long"
    ).dropDuplicates()
    survivors = {
        r.doc_id for r in dedup_by_components(df, "doc_id", pairs).collect()
    }
    comp = _union_find_components(edges)
    clusters = {}
    for n, c in comp.items():
        clusters.setdefault(c, set()).add(n)
    expected = {min(members) for members in clusters.values()}
    untouched = set(node_ids) - set(comp)
    # exactly the cluster minima plus every row in no pair
    assert survivors == expected | untouched


# size-VARIED pool: documents of very different shingle counts make the
# round-12 length filter actually prune (min/max size ratio below t),
# so losslessness is exercised where the filter bites, not vacuously
_VARIED_POOL = [
    "alpha beta gamma",
    "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lamda mu nu xi omicron pi rho sigma tau upsilon",
    "one two three four five six seven",
    "one two three four five six seven eight nine ten eleven twelve",
    "unrelated words entirely here now",
]


@given(
    st.lists(st.sampled_from(_VARIED_POOL), min_size=2, max_size=8),
    st.sampled_from([0.3, 0.5, 0.8, 0.9]),
)
@settings(**_SETTINGS)
def test_prefix_filter_with_length_filter_is_lossless(spark, texts, t):
    """Round-12: the prefix filter WITH the Xiao length filter folded
    into its candidate join returns exactly the brute-force pairs and
    scores for any corpus and threshold — both filters are lossless."""
    from olist_snowflake_dbt_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_filter_jaccard_pairs,
    )

    df = _df(spark, texts)
    exact = {
        (r.id_a, r.id_b): round(r.jaccard, 12)
        for r in ngram_jaccard_pairs(df, "text", "doc_id", 3, t).collect()
    }
    pruned = {
        (r.id_a, r.id_b): round(r.jaccard, 12)
        for r in prefix_filter_jaccard_pairs(
            df, "text", "doc_id", 3, t
        ).collect()
    }
    assert pruned == exact
