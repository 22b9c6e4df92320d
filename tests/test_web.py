"""Unit tests for operators/web.py URL canonicalization semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from olist_snowflake_dbt_spark.operators.web import (
    canonicalize_url,
    host_url_stats,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r.u.asDict() for r in df.select(canonicalize_url("url").alias("u")).collect()
    ]


def test_scheme_www_case_fragment_and_tracking_are_identity_free(spark):
    variants = [
        "https://WWW.News.Example.COM/a/b?utm_source=x&ref=1#top",
        "http://news.example.com/a/b/?ref=1&utm_campaign=y",
        "news.example.com/a/b?ref=1",
    ]
    out = _canon(spark, variants)
    assert len({o["canonical"] for o in out}) == 1
    assert out[0]["canonical"] == "news.example.com/a/b?ref=1"
    assert out[0]["host"] == "news.example.com"
    assert out[0]["domain"] == "example.com"


def test_param_order_is_sorted_and_non_tracking_kept(spark):
    a, b = _canon(
        spark,
        [
            "http://h.example.com/p?b=2&a=1&utm_medium=m",
            "http://h.example.com/p?a=1&b=2",
        ],
    )
    assert a["canonical"] == b["canonical"] == "h.example.com/p?a=1&b=2"
    assert a["params"] == "a=1&b=2"


def test_root_path_and_no_query_edge_cases(spark):
    out = _canon(spark, ["https://example.com/", "example.com", "www.example.com#f"])
    # a root "/" is a single-char path and is KEPT (only non-root
    # trailing slashes strip); bare hosts canonicalize to themselves
    assert out[0]["canonical"] == "example.com/"
    assert out[1]["canonical"] == "example.com"
    assert out[2]["canonical"] == "example.com"
    assert all(o["domain"] == "example.com" for o in out)


def test_inner_www_label_not_stripped_and_single_label_host(spark):
    out = _canon(spark, ["http://www.www.example.com/x", "http://localhost/x"])
    assert out[0]["host"] == "www.example.com"
    assert out[1]["host"] == "localhost"
    assert out[1]["domain"] == "localhost"


def test_null_url_yields_null_fields(spark):
    df = spark.createDataFrame([(None,)], "url string")
    row = df.select(canonicalize_url("url").alias("u")).collect()[0]
    assert row.u.canonical is None and row.u.host is None


def test_host_stats_counts_dedup_denominator(spark):
    df = spark.createDataFrame(
        [
            ("https://www.a.example.com/x?utm_source=1",),
            ("http://A.example.com/x",),
            ("http://a.example.com/y",),
            ("http://b.example.com/z",),
        ],
        "url string",
    )
    got = {r.host: r for r in host_url_stats(df, "url").collect()}
    assert got["a.example.com"].n_urls == 3
    assert got["a.example.com"].n_canonical == 2
    assert got["a.example.com"].sample_canonical == "a.example.com/x"
    assert got["b.example.com"].n_urls == 1


def test_canonicalization_is_whole_stage_codegen(spark):
    """The operator must stay JVM-side: no BatchEvalPython / Python UDF
    in the physical plan (pure Catalyst contract from the module header)."""
    df = spark.createDataFrame([("http://x.example.com/a",)], "url string")
    plan = (
        df.select(canonicalize_url("url").alias("u"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cap_per_host_is_deterministic_and_capped(spark):
    from olist_snowflake_dbt_spark.operators.web import cap_per_host

    rows = [(i, f"http://h{i % 3}.example.com/p{i}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    kept = cap_per_host(df, "url", "doc_id", cap=4)
    got = kept.collect()
    by_host = {}
    for r in got:
        by_host.setdefault(r.host, []).append(r.doc_id)
    assert set(by_host) == {"h0.example.com", "h1.example.com", "h2.example.com"}
    assert all(len(v) == 4 for v in by_host.values())
    assert all(1 <= r.host_rank <= 4 for r in got)
    # determinism across partitionings: same survivor set
    again = {
        r.doc_id for r in cap_per_host(df.repartition(7), "url", "doc_id", cap=4).collect()
    }
    assert again == {r.doc_id for r in got}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        cap_per_host(df, "url", "doc_id", cap=0)


def test_cap_at_domain_level_and_approx_stats(spark):
    from olist_snowflake_dbt_spark.operators.web import (
        cap_per_host,
        host_url_stats,
    )

    rows = [
        (i, f"http://sub{i % 5}.example.com/p{i}") for i in range(20)
    ] + [(100 + i, f"http://other{i}.net/p") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    # domain-level cap: all 5 example.com subdomains share one budget
    kept = cap_per_host(df, "url", "doc_id", cap=4, level="domain").collect()
    by_dom = {}
    for r in kept:
        by_dom[r.domain] = by_dom.get(r.domain, 0) + 1
    assert by_dom["example.com"] == 4
    import pytest as _pytest

    with _pytest.raises(ValueError, match="level"):
        cap_per_host(df, "url", "doc_id", cap=1, level="tld")

    # approx mode: one-exchange plan (no distinct Expand), estimate sane
    approx = host_url_stats(df, "url", exact=False)
    plan = approx._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    # stats are per (host, domain): sum the 5 example.com subdomain rows
    total = sum(
        r.n_canonical for r in approx.collect() if r.domain == "example.com"
    )
    assert total >= 15  # HLL estimate of 20 distinct canonicals
