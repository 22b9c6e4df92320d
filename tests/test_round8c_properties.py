"""Property-based tests (hypothesis) for the round-8 second-wave
operators — invariants for ANY input, not just fixtures:

- **URL canonicalization**: IDEMPOTENCE (canonicalize(canonical) ==
  canonical — the defining property of a canonical form), host is
  always lowercase with no leading www., no tracking param survives,
  and params come out sorted;
- **per-host cap**: survivors are a subset of the input, per-host
  counts never exceed the cap, and the survivor set is invariant under
  repartitioning (determinism);
- **threshold grammar** (pure Python, hammered): _threshold_hit agrees
  with Python's operators for every (value, op, n) combination, and the
  int form is exactly "> n";
- **MMR greedy** (pure structure): selected docs are distinct, come
  from the candidate set, rank 1 maximizes relevance, and λ=lam_den
  reduces to relevance order;
- **gap_fill**: every observation bucket appears with its value,
  spine row count is span/step + 1 per key, and locf is NULL only
  before the key's first observation.

Spark `max_examples` kept small — each example pays Spark jobs; the
pure-Python properties run hundreds of cases.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# ---------------------------------------------------------------- pure


@given(
    value=st.integers(min_value=-5, max_value=10_000),
    n=st.integers(min_value=-5, max_value=10_000),
    op=st.sampled_from(["!=", ">=", "<=", ">", "<", "="]),
)
def test_threshold_grammar_matches_python(value, n, op):
    from olist_snowflake_dbt_spark.operators.dq import _threshold_hit

    import operator as _o

    ref = {"!=": _o.ne, ">=": _o.ge, "<=": _o.le, ">": _o.gt,
           "<": _o.lt, "=": _o.eq}[op](value, n)
    assert _threshold_hit(value, f"{op}{n}") == ref
    assert _threshold_hit(value, n) == (value > n)


@given(
    rel=st.dictionaries(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=0, max_value=10**9),
        min_size=1,
        max_size=10,
    ),
    lam=st.integers(min_value=1, max_value=10),
    data=st.data(),
)
@settings(
    max_examples=25, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_mmr_greedy_structure(spark, rel, lam, data):
    from olist_snowflake_dbt_spark.operators.retrieval import mmr_rerank

    docs = sorted(rel)
    sims = []
    for a in docs:
        for b in docs:
            if a != b:
                s = data.draw(st.integers(min_value=0, max_value=10**9))
                sims.append((0, a, b, s))
    cand = spark.createDataFrame(
        [(0, d, r) for d, r in rel.items()],
        "query_id long, doc_id long, rel_nano long",
    )
    pair = spark.createDataFrame(
        sims or [(0, -1, -2, 0)],
        "query_id long, doc_a long, doc_b long, sim_nano long",
    )
    out = mmr_rerank(cand, pair, k=3, lam_num=lam, lam_den=10).collect()
    chosen = [r.doc_id for r in sorted(out, key=lambda r: r.rank)]
    assert len(chosen) == min(3, len(docs))
    assert len(set(chosen)) == len(chosen)
    assert set(chosen) <= set(docs)
    # rank 1 is pure relevance with min-doc_id tie-break
    best_rel = max(rel.values())
    expect_first = min(d for d, r in rel.items() if r == best_rel)
    assert chosen[0] == expect_first


# --------------------------------------------------------------- spark

_path_seg = st.text(
    alphabet="abcdefghij0123456789", min_size=1, max_size=6
)
_param = st.tuples(
    st.sampled_from(["a", "b", "id", "ref", "utm_source", "utm_x", "gclid"]),
    st.text(alphabet="xyz129", min_size=1, max_size=4),
).map(lambda kv: f"{kv[0]}={kv[1]}")


@st.composite
def _messy_url(draw):
    scheme = draw(st.sampled_from(["http://", "https://", ""]))
    www = draw(st.sampled_from(["www.", "WWW.", ""]))
    host = draw(st.sampled_from(["Ex.Example.COM", "a.b.example.com", "solo"]))
    segs = draw(st.lists(_path_seg, min_size=0, max_size=3))
    path = ("/" + "/".join(segs)) if segs else ""
    trail = draw(st.sampled_from(["/", ""])) if path else ""
    params = draw(st.lists(_param, min_size=0, max_size=4))
    q = ("?" + "&".join(params)) if params else ""
    frag = draw(st.sampled_from(["#top", ""]))
    return f"{scheme}{www}{host}{path}{trail}{q}{frag}"


@given(urls=st.lists(_messy_url(), min_size=1, max_size=8))
@settings(
    max_examples=20, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_canonicalize_idempotent_and_clean(spark, urls):
    from olist_snowflake_dbt_spark.operators.web import canonicalize_url

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(canonicalize_url("url").alias("u")).select(
        "u.canonical", "u.host", "u.params"
    )
    rows = once.collect()
    for r in rows:
        assert r.host == r.host.lower()
        assert not r.host.startswith("www.")
        for p in (r.params.split("&") if r.params else []):
            assert not p.startswith(("utm_", "fbclid=", "gclid="))
        if r.params:
            parts = r.params.split("&")
            assert parts == sorted(parts)
    # idempotence: canonicalizing the canonical form is a fixed point
    twice = (
        once.select(F.col("canonical").alias("url"))
        .select(canonicalize_url("url").alias("u"))
        .select("u.canonical")
        .collect()
    )
    assert [t.canonical for t in twice] == [r.canonical for r in rows]


@given(
    n=st.integers(min_value=1, max_value=25),
    cap=st.integers(min_value=1, max_value=5),
)
@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_cap_per_host_subset_and_bound(spark, n, cap):
    from olist_snowflake_dbt_spark.operators.web import cap_per_host

    rows = [(i, f"http://h{i % 3}.example.com/p{i % 7}") for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    kept = cap_per_host(df, "url", "doc_id", cap=cap).collect()
    assert {r.doc_id for r in kept} <= set(range(n))
    per_host: dict[str, int] = {}
    for r in kept:
        per_host[r.host] = per_host.get(r.host, 0) + 1
    assert all(v <= cap for v in per_host.values())
    # every host present in the input appears among survivors
    assert len(per_host) == len({f"h{i % 3}.example.com" for i in range(n)})


@given(
    obs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=200),  # hour offset
            st.floats(
                min_value=-1e6, max_value=1e6,
                allow_nan=False, allow_infinity=False,
            ),
        ),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    )
)
@settings(
    max_examples=15, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_gap_fill_spine_and_observation_preservation(spark, obs):
    from olist_snowflake_dbt_spark.operators.timeseries import gap_fill

    base = 1_699_999_200  # hour-aligned (divisible by 3600)
    rows = [
        (1, h, float(v))
        for h, v in obs
    ]
    df = spark.createDataFrame(rows, "user_id long, h long, value double").selectExpr(
        "user_id",
        f"timestamp_seconds({base} + h * 3600) AS ts",
        "CAST(h AS LONG) AS event_id",
        "value",
    )
    out = gap_fill(df, "user_id", "ts", "value", step_seconds=3600,
                   order_tiebreak="event_id").collect()
    hours = sorted(h for h, _ in obs)
    assert len(out) == hours[-1] - hours[0] + 1
    got = {r.bucket: r for r in out}
    vals = dict(obs)
    n_obs = 0
    import datetime as dt

    epoch = dt.datetime(1970, 1, 1)
    for r in out:
        h = (int((r.bucket - epoch).total_seconds()) - base) // 3600
        if h in vals:
            assert r.observed == vals[h]
            n_obs += 1
        else:
            assert r.observed is None
        # locf defined everywhere on the spine (first bucket IS an obs)
        assert r.locf is not None
    assert n_obs == len(obs)


@given(
    existing_ids=st.sets(st.integers(min_value=0, max_value=20), min_size=1),
    batch_ids=st.sets(st.integers(min_value=0, max_value=20), min_size=1),
    update_amount=st.booleans(),
)
@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_merge_update_columns_conservation(
    spark, existing_ids, batch_ids, update_amount
):
    """For ANY key overlap: result keys = existing ∪ batch; matched rows
    take batch values ONLY in the update set; untouched and inserted
    rows pass through whole."""
    from olist_snowflake_dbt_spark.operators.incremental import (
        incremental_merge,
    )

    existing = spark.createDataFrame(
        [(i, float(i), f"e{i}") for i in sorted(existing_ids)],
        "id long, amount double, audit string",
    )
    batch = spark.createDataFrame(
        [(i, float(i) + 100.0, f"b{i}") for i in sorted(batch_ids)],
        "id long, amount double, audit string",
    )
    cols = ["amount"] if update_amount else ["audit"]
    out = {
        r.id: r
        for r in incremental_merge(
            existing, batch, ["id"], merge_update_columns=cols
        ).collect()
    }
    assert set(out) == existing_ids | batch_ids
    for i in existing_ids | batch_ids:
        r = out[i]
        if i in existing_ids and i in batch_ids:
            if update_amount:
                assert (r.amount, r.audit) == (i + 100.0, f"e{i}")
            else:
                assert (r.amount, r.audit) == (float(i), f"b{i}")
        elif i in existing_ids:
            assert (r.amount, r.audit) == (float(i), f"e{i}")
        else:
            assert (r.amount, r.audit) == (i + 100.0, f"b{i}")


def test_cap_per_host_bounds_the_hot_host(spark):
    """Zipfian skew: one host holding ~90% of a corpus still yields at
    most `cap` survivors — the per-domain cap IS the skew guard, and the
    survivor count is exact, not approximate."""
    from olist_snowflake_dbt_spark.operators.web import cap_per_host

    rows = [(i, "http://hot.example.com/p%d" % i) for i in range(900)]
    rows += [(1000 + i, f"http://cold{i % 10}.example.com/p") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, url string").repartition(16)
    kept = cap_per_host(df, "url", "doc_id", cap=7).collect()
    per_host = {}
    for r in kept:
        per_host[r.host] = per_host.get(r.host, 0) + 1
    assert per_host["hot.example.com"] == 7
    assert all(v <= 7 for v in per_host.values())
    assert len(per_host) == 11
