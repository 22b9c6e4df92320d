"""Property-based tests (hypothesis) for the round-13 operators —
invariants that must hold for ANY input, not just fixtures:

- **soft_dedup_weights**: a corpus of c distinct texts each duplicated
  k_c times gives every copy of text c weight exactly scale/k_c
  (disjoint vocabularies ⇒ no cross-text gram sharing), sum_freq =
  n_grams·k_c, and the weight is invariant under repartitioning;
- **token_budget_select**: operator keep-set == the strict-prefix
  reference for arbitrary (score, tokens) frames (negative scores,
  ties, degenerate one-bucket corpora), and kept tokens never exceed
  the budget;
- **oph_minhash_signatures**: signatures are a function of the text
  alone — equal texts ⇒ equal signatures regardless of ids/partitioning
  — and every signature is fully densified (64 non-null slots) whenever
  the doc has ≥ 1 word.

Example counts kept small — each example pays Spark jobs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from olist_snowflake_dbt_spark.operators.dedup import oph_minhash_signatures
from olist_snowflake_dbt_spark.operators.sampling import token_budget_select
from olist_snowflake_dbt_spark.operators.text import soft_dedup_weights

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# duplication profile: up to 4 distinct texts, each duplicated 1-5x
_dup_profile = st.lists(st.integers(1, 5), min_size=1, max_size=4)


@given(profile=_dup_profile)
@settings(**_SETTINGS)
def test_soft_dedup_weight_is_exactly_inverse_multiplicity(spark, profile):
    # disjoint vocabularies per text: text c uses words c0..c5
    rows, owner = [], {}
    doc_id = 0
    for c, k in enumerate(profile):
        text = " ".join(f"w{c}x{j}" for j in range(6))
        for _ in range(k):
            rows.append((doc_id, text))
            owner[doc_id] = c
            doc_id += 1
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(3)
    out = {r.doc_id: r for r in soft_dedup_weights(df).collect()}
    for i, c in owner.items():
        k = profile[c]
        assert out[i].n_grams == 5
        assert out[i].sum_freq == 5 * k
        assert out[i].weight_nano == 1_000_000_000 // k


_budget_rows = st.lists(
    st.tuples(st.integers(-500, 500), st.integers(1, 30)),
    min_size=1,
    max_size=25,
)


@given(rows=_budget_rows, num=st.integers(1, 9))
@settings(**_SETTINGS)
def test_token_budget_matches_strict_prefix_reference(spark, rows, num):
    rows = [(i, s, t) for i, (s, t) in enumerate(rows)]
    df = spark.createDataFrame(rows, "doc_id long, score long, tok long")
    out = {
        r.doc_id: r.keep
        for r in token_budget_select(
            df, "score", "tok", "doc_id", budget_num=num, budget_den=10
        ).collect()
    }
    budget = (sum(t for _, _, t in rows) * num) // 10
    kept_ref, spent = set(), 0
    for i, s, t in sorted(rows, key=lambda r: (-r[1], r[0])):
        if spent + t > budget:
            break
        kept_ref.add(i)
        spent += t
    got = {i for i, k in out.items() if k}
    assert got == kept_ref
    assert sum(t for i, _, t in rows if i in got) <= budget


_texts = st.lists(
    st.text(alphabet="abcd ", min_size=0, max_size=30), min_size=1, max_size=5
)


@given(texts=_texts)
@settings(**_SETTINGS)
def test_oph_signature_is_a_pure_function_of_text(spark, texts):
    # plant every text twice under different ids and partitionings
    rows = [(i, t) for i, t in enumerate(texts)]
    rows += [(1000 + i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(4)
    sigs = {r["__id"]: r["__sig"] for r in
            oph_minhash_signatures(df, "text", "doc_id").collect()}
    for i, t in enumerate(texts):
        has_word = any(c.isalnum() for c in t)
        if not has_word:
            assert i not in sigs and 1000 + i not in sigs
            continue
        assert sigs[i] == sigs[1000 + i]
        assert len(sigs[i]) == 64 and all(v is not None for v in sigs[i])
