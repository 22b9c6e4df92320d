"""Property-based tests (hypothesis) for the deterministic sampling
operators — the invariants a training-data pipeline relies on at 100 TB:

- **split partition**: hash_split assigns every row exactly one label
  (or NULL remainder); splits are disjoint by construction and the
  assignment is a pure function of the id (stable under re-runs and
  physical re-layout);
- **sample ⊆ corpus, monotone**: hash_sample(f1) ⊆ hash_sample(f2)
  for f1 ≤ f2 (growing a sample never swaps documents in/out — the
  boundary only moves);
- **growth stability**: adding new rows never flips an existing row's
  keep/drop decision or split label;
- **mix_sources**: per-source filters are independent — a row's
  survival depends only on (its source's weight, its own id).

Example counts kept small — each example pays Spark jobs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from olist_snowflake_dbt_spark.operators.sampling import (
    hash_sample,
    hash_split,
    mix_sources,
)

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_ids_strategy = st.lists(
    st.integers(min_value=0, max_value=10**9), min_size=1, max_size=30,
    unique=True,
)

_fracs_strategy = st.tuples(
    st.floats(min_value=0.05, max_value=0.6),
    st.floats(min_value=0.05, max_value=0.35),
)


def _df(spark, ids):
    return spark.createDataFrame(
        [(i, f"src_{i % 3}") for i in ids], "doc_id long, source string"
    )


@given(_ids_strategy, _fracs_strategy)
@settings(**_SETTINGS)
def test_hash_split_is_a_partition_and_layout_invariant(spark, ids, fracs):
    train_f, test_f = fracs
    df = _df(spark, ids)
    out = hash_split(df, "doc_id", {"train": train_f, "test": test_f})
    rows = {r.doc_id: r.split for r in out.collect()}
    # every input row appears exactly once, labeled or NULL remainder
    assert set(rows) == set(ids)
    assert set(rows.values()) <= {"train", "test", None}
    # physical re-layout changes nothing
    relaid = hash_split(
        df.repartition(5).sortWithinPartitions("doc_id", ascending=False),
        "doc_id",
        {"train": train_f, "test": test_f},
    )
    assert {r.doc_id: r.split for r in relaid.collect()} == rows


@given(_ids_strategy, _fracs_strategy)
@settings(**_SETTINGS)
def test_hash_sample_monotone_and_subset(spark, ids, fracs):
    small_f, delta = fracs
    big_f = min(1.0, small_f + delta)
    df = _df(spark, ids)
    small = {r.doc_id for r in hash_sample(df, "doc_id", small_f).collect()}
    big = {r.doc_id for r in hash_sample(df, "doc_id", big_f).collect()}
    assert small <= big <= set(ids)


@given(_ids_strategy, _fracs_strategy)
@settings(**_SETTINGS)
def test_growth_never_flips_existing_decisions(spark, ids, fracs):
    frac = fracs[0]
    base_ids = ids[: max(1, len(ids) // 2)]
    base = _df(spark, base_ids)
    grown = _df(spark, ids)
    kept_before = {r.doc_id for r in hash_sample(base, "doc_id", frac).collect()}
    kept_after = {r.doc_id for r in hash_sample(grown, "doc_id", frac).collect()}
    # restricted to the original corpus, the decisions are identical
    assert kept_after & set(base_ids) == kept_before
    split_before = {
        r.doc_id: r.split
        for r in hash_split(base, "doc_id", {"train": frac}).collect()
    }
    split_after = {
        r.doc_id: r.split
        for r in hash_split(grown, "doc_id", {"train": frac}).collect()
    }
    assert {k: v for k, v in split_after.items() if k in split_before} == split_before


@given(_ids_strategy, _fracs_strategy)
@settings(**_SETTINGS)
def test_mix_sources_per_source_independence(spark, ids, fracs):
    w0, w1 = fracs
    df = _df(spark, ids)
    mixed = {
        r.doc_id
        for r in mix_sources(
            df, "source", "doc_id", {"src_0": w0, "src_1": w1}
        ).collect()
    }
    # equals the union of independently sampled per-source corpora
    # (src_2 absent from weights → dropped entirely)
    per_source = set()
    for s, w in (("src_0", w0), ("src_1", w1)):
        sub = df.filter(f"source = '{s}'")
        per_source |= {r.doc_id for r in hash_sample(sub, "doc_id", w).collect()}
    assert mixed == per_source
