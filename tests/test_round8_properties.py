"""Property-based tests (hypothesis) for the round-8 operators —
invariants that must hold for ANY input, not just fixtures:

- **table_changes**: for arbitrary old/new tables, applying the delta
  to old reproduces new exactly (the stream-consumer contract), and the
  output never mentions an unchanged key;
- **ivm_apply_changes**: maintained aggregate == recomputed aggregate
  for arbitrary churn, and composes across consecutive deltas;
- **chunk_windows**: chunk layout arithmetic (start = idx*stride, full
  windows except the short-doc singleton, chunk count formula) for any
  (n_words, window, stride);
- **reservoir_per_group**: exactly min(n, |group|) rows, always a
  subset of the group, invariant under repartitioning;
- **mixture_weights**: weights sum to 1 (up to integer-division slack),
  the smallest source carries acceptance rate exactly 1, and flattening
  holds in its correct form — the boost ratio weight/share is monotone
  decreasing in source size.

Example counts kept small — each example pays Spark jobs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from olist_snowflake_dbt_spark.operators.incremental import ivm_apply_changes
from olist_snowflake_dbt_spark.operators.sampling import (
    chunk_windows,
    mixture_weights,
    reservoir_per_group,
)
from olist_snowflake_dbt_spark.plans.timetravel import table_changes

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# a "table version": key -> small payload value
_version = st.dictionaries(
    st.integers(0, 12), st.integers(0, 3), min_size=0, max_size=10
)


def _vdf(spark, d):
    rows = [(k, f"v{v}") for k, v in d.items()] or None
    if rows is None:
        return spark.createDataFrame([], "k int, v string")
    return spark.createDataFrame(rows, "k int, v string")


@given(old=_version, new=_version)
@settings(**_SETTINGS)
def test_changes_roundtrip_any_versions(spark, old, new):
    o, n = _vdf(spark, old), _vdf(spark, new)
    ch = table_changes(o, n, ["k"])
    rows = ch.collect()
    unchanged = {k for k in old if k in new and old[k] == new[k]}
    assert all(r.k not in unchanged for r in rows)
    deleted = ch.filter("metadata_action = 'DELETE'").select("k")
    inserted = ch.filter("metadata_action = 'INSERT'").select("k", "v")
    rebuilt = o.join(deleted, "k", "left_anti").unionByName(inserted)
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        (k, f"v{v}") for k, v in new.items()
    )


@given(old=_version, new=_version)
@settings(**_SETTINGS)
def test_ivm_maintained_equals_recompute_any_churn(spark, old, new):
    o, n = _vdf(spark, old), _vdf(spark, new)
    grp = F.col("k") % 3  # arbitrary grouping over the key space

    def agg(df):
        return (
            df.withColumn("g", grp)
            .groupBy("g")
            .agg(F.count("*").alias("n_rows"),
                 F.sum(F.length("v")).alias("sum_len"))
        )

    ch = table_changes(o, n, ["k"]).withColumn("g", grp).withColumn(
        "len_v", F.length("v")
    )
    got = ivm_apply_changes(agg(o), ch, ["g"], sum_cols={"sum_len": "len_v"})
    want = agg(n)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


@given(
    n_words=st.integers(0, 40),
    window=st.integers(1, 12),
    stride=st.integers(1, 12),
)
@settings(**_SETTINGS)
def test_chunk_windows_layout_arithmetic(spark, n_words, window, stride):
    text = " ".join(f"w{i}" for i in range(n_words))
    df = spark.createDataFrame([(1, text)], "id int, text string")
    wordsc = F.split("text", " ") if n_words else F.array().cast("array<string>")
    rows = sorted(
        map(tuple, chunk_windows(df, "id", wordsc, window, stride).collect())
    )
    if n_words <= window:
        # one (possibly short) chunk of everything
        assert len(rows) == 1
        assert rows[0][1:4] == (0, 0, n_words)
    else:
        expect = (n_words - window) // stride + 1
        assert len(rows) == expect
        for _, idx, start, ln, txt in rows:
            assert start == idx * stride
            assert ln == window  # only FULL windows past the singleton case
            assert len(txt.split(" ")) == window


@given(
    sizes=st.dictionaries(
        st.sampled_from(["a", "b", "c"]), st.integers(1, 12), min_size=1
    ),
    n=st.integers(1, 6),
)
@settings(**_SETTINGS)
def test_reservoir_exact_size_subset_partition_invariant(spark, sizes, n):
    rows = [(g, g + str(i)) for g, c in sizes.items() for i in range(c)]
    df = spark.createDataFrame(rows, "g string, id string")
    out = reservoir_per_group(df, "g", "id", n).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r.g, set()).add(r.id)
    for g, c in sizes.items():
        assert len(by_g.get(g, set())) == min(n, c)
        assert by_g[g] <= {g + str(i) for i in range(c)}
    # physical layout must not change the sample
    again = reservoir_per_group(df.repartition(7), "g", "id", n).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


@given(
    sizes=st.dictionaries(
        st.sampled_from(["s1", "s2", "s3", "s4"]),
        st.integers(1, 400),
        min_size=2,
    )
)
@settings(**_SETTINGS)
def test_mixture_weights_invariants(spark, sizes):
    rows = [(g,) for g, c in sizes.items() for _ in range(c)]
    df = spark.createDataFrame(rows, "src string")
    out = {r.src: r for r in mixture_weights(df, "src").collect()}
    total = sum(r.weight for r in out.values())
    assert abs(total - 1.0) < 1e-6  # integer-division slack only
    assert max(r.rate_vs_max for r in out.values()) == 1.0
    assert all(0 < r.rate_vs_max <= 1.0 for r in out.values())
    # flattening, stated correctly: the boost ratio weight/share is
    # monotone DECREASING in source size (w ∝ sqrt(n) ⇒ w/p ∝ 1/sqrt(n)),
    # so the smallest source always carries the maximal acceptance rate
    ordered = sorted(sizes.items(), key=lambda kv: kv[1])
    rates = [out[g].rate_vs_max for g, _ in ordered]
    assert all(a >= b - 1e-12 for a, b in zip(rates, rates[1:]))
    smallest = ordered[0][0]
    assert out[smallest].rate_vs_max == 1.0