"""Property-based tests (hypothesis) for the round-7 operators —
invariants that must hold for ANY corpus, not just fixtures:

- **duplicated spans**: 0 ≤ n_dup_words ≤ n_words always; a corpus of
  all-identical docs (≥ n words) is fully covered; a corpus of docs
  with disjoint vocabularies has zero coverage; stats and removal agree
  (kept + covered = total) on every input;
- **Gopher gate**: flags never NULL; duplicating a document's text does
  not change line/word RATIO flags that are scale-free (symbol ratio,
  alpha-words) — thresholds are cross-multiplied integers;
- **hashed linear score**: logit is permutation-invariant (sum), equals
  the sum over per-word singleton logits, and empty docs score 0;
- **integer PageRank**: total mass is conserved for arbitrary random
  graphs and any iteration count.

Example counts kept small — each example pays Spark jobs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from olist_snowflake_dbt_spark.operators.dedup import (
    duplicated_span_stats,
    remove_duplicated_spans,
)
from olist_snowflake_dbt_spark.operators.graph import integer_pagerank
from olist_snowflake_dbt_spark.operators.text import (
    gopher_rules,
    hashed_linear_score,
)

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_word = st.sampled_from(["alpha", "beta", "gamma", "delta", "x1", "42"])
_doc = st.lists(_word, min_size=0, max_size=10).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=5)


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


@given(_corpus)
@settings(**_SETTINGS)
def test_span_stats_bounds_and_partition(spark, texts):
    df = _docs_df(spark, texts)
    stats = duplicated_span_stats(df, "text", "doc_id", n=3, min_freq=2)
    cut = remove_duplicated_spans(df, "text", "doc_id", n=3, min_freq=2)
    joined = stats.join(cut.select("doc_id", "n_kept"), "doc_id").collect()
    assert len(joined) == len(texts)
    for r in joined:
        assert 0 <= r.n_dup_words <= r.n_words
        assert r.n_kept + r.n_dup_words == r.n_words


@given(st.lists(_word, min_size=3, max_size=6).map(" ".join))
@settings(**_SETTINGS)
def test_span_stats_identical_docs_fully_covered(spark, doc):
    df = _docs_df(spark, [doc, doc])
    rows = duplicated_span_stats(df, "text", "doc_id", n=3, min_freq=2).collect()
    for r in rows:
        assert r.n_dup_words == r.n_words  # every position duplicated


def test_span_stats_disjoint_vocab_zero_coverage(spark):
    df = _docs_df(spark, ["a b c d e", "f g h i j", "k l m n o"])
    rows = duplicated_span_stats(df, "text", "doc_id", n=3, min_freq=2).collect()
    assert all(r.n_dup_words == 0 for r in rows)


@given(_doc)
@settings(**_SETTINGS)
def test_gopher_flags_never_null(spark, doc):
    r = gopher_rules(_docs_df(spark, [doc]), "text").collect()[0]
    for fl in (
        "ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
        "ok_bullet_lines", "ok_ellipsis_lines", "ok_alpha_words",
        "ok_stopwords", "pass_gopher",
    ):
        assert getattr(r, fl) in (True, False)


@given(st.lists(_word, min_size=1, max_size=8))
@settings(**_SETTINGS)
def test_hashed_linear_score_is_sum_and_permutation_invariant(spark, ws):
    doc = " ".join(ws)
    rev = " ".join(reversed(ws))
    singles = [" ".join([w]) for w in ws]
    df = _docs_df(spark, [doc, rev] + singles)
    got = {
        r.doc_id: r.logit_milli
        for r in hashed_linear_score(df, "text", "doc_id").collect()
    }
    assert got[0] == got[1]  # order never matters in a sum
    assert got[0] == sum(got[i + 2] for i in range(len(ws)))


def test_hashed_linear_score_empty_doc(spark):
    r = hashed_linear_score(_docs_df(spark, [""]), "text", "doc_id").collect()[0]
    assert r.logit_milli == 0 and r.score_per_word == 0.0 and r.keep


@given(
    st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=12,
        unique=True,
    ),
    st.integers(1, 3),
)
@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pagerank_mass_conservation_random_graphs(spark, pairs, iters):
    e = spark.createDataFrame(pairs, "src long, dst long")
    n_nodes = (
        e.select(F.col("src").alias("n"))
        .unionByName(e.select(F.col("dst").alias("n")))
        .distinct()
        .count()
    )
    out = integer_pagerank(e, iterations=iters, init_points=10_000, checkpoint=False)
    total = out.agg(F.sum("pagerank_points").alias("t")).collect()[0].t
    assert total == n_nodes * 10_000
