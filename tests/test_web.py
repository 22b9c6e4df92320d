"""Unit tests for operators/web.py URL canonicalization semantics."""

from __future__ import annotations

import re

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


class TestRegistrableDomainPSL:
    """Public-suffix longest-match: the eTLD+1 machinery that replaces
    the documented 2-label approximation for grouping/capping."""

    def _reg(self, spark, hosts):
        from olist_snowflake_dbt_spark.operators.web import (
            with_registrable_domain,
        )

        df = spark.createDataFrame([(h,) for h in hosts], "host string")
        out = with_registrable_domain(df, "host")
        return {r.host: r.registrable_domain for r in out.collect()}

    def test_cctld_grouping_and_longest_match(self, spark):
        got = self._reg(
            spark,
            [
                "a.shop.co.uk",          # 2-label suffix: co.uk
                "b.shop.co.uk",          # same registrable as above
                "deep.sub.shop.co.uk",   # extra labels don't change eTLD+1
                "x.bucket.s3.amazonaws.com",  # 3-label suffix wins over com
                "pages.github.io",       # io is NOT the suffix here
                "plain.example.com",     # wildcard fallback: last 2 labels
                "weird.example.zz",      # unknown TLD: same wildcard rule
            ],
        )
        assert got["a.shop.co.uk"] == "shop.co.uk"
        assert got["b.shop.co.uk"] == "shop.co.uk"
        assert got["deep.sub.shop.co.uk"] == "shop.co.uk"
        assert got["x.bucket.s3.amazonaws.com"] == "bucket.s3.amazonaws.com"
        assert got["pages.github.io"] == "pages.github.io"
        assert got["plain.example.com"] == "example.com"
        assert got["weird.example.zz"] == "example.zz"

    def test_bare_suffix_and_single_label_hosts(self, spark):
        got = self._reg(spark, ["co.uk", "localhost"])
        # a host that IS a public suffix has no registrable label left;
        # the documented contract yields the host itself (via fallback)
        assert got["co.uk"] == "co.uk"
        assert got["localhost"] == "localhost"

    def test_mixed_case_hosts_match_case_insensitively(self, spark):
        # DNS names are case-insensitive: a mixed-case host must hit
        # the same suffix rules as its lowercase form, and the output
        # registrable domain is always lowercase
        got = self._reg(spark, ["A.Shop.CO.UK", "Plain.Example.COM"])
        assert got["A.Shop.CO.UK"] == "shop.co.uk"
        assert got["Plain.Example.COM"] == "example.com"

    def test_caller_dim_widths_and_duplicates(self, spark):
        """A caller-supplied dim with 4-label rules joins at width 4
        (widths are derived from the dim, not hardcoded), and duplicate
        suffix rows must not fan out input rows."""
        from olist_snowflake_dbt_spark.operators.web import (
            with_registrable_domain,
        )

        dim = spark.createDataFrame(
            [
                ("co.uk", 2),
                ("co.uk", 2),  # duplicate rule row
                ("pref.name.fj.cn", 4),  # synthetic 4-label rule
            ],
            "suffix string, n_labels int",
        )
        df = spark.createDataFrame(
            [("x.pref.name.fj.cn",), ("a.shop.co.uk",), ("a.shop.co.uk",)],
            "host string",
        )
        out = with_registrable_domain(df, "host", suffixes=dim).collect()
        assert len(out) == 3  # duplicate dim row must not duplicate input
        got = {(r.host, r.registrable_domain) for r in out}
        assert ("x.pref.name.fj.cn", "x.pref.name.fj.cn") in got
        assert ("a.shop.co.uk", "shop.co.uk") in got

    def test_zero_shuffle_plan(self, spark):
        """The PSL lookup must stay map-only: broadcast joins, no
        Exchange in the plan."""
        from olist_snowflake_dbt_spark.operators.web import (
            with_registrable_domain,
        )

        df = spark.range(100).select(
            F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".co.uk"))
            .alias("host")
        )
        plan = with_registrable_domain(df, "host")._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "Exchange hashpartitioning" not in plan


class TestBlocklist:
    def _docs(self, spark):
        return spark.createDataFrame(
            [
                (1, "http://a.shop.co.uk/news/x"),
                (2, "http://b.shop.co.uk/other/y"),
                (3, "http://c.fine.co.uk/news/x"),
                (4, "http://tracker.example.com/p"),
                (5, "http://keep.example.org/p"),
            ],
            "doc_id long, url string",
        )

    def test_domain_and_path_prefix_rules(self, spark):
        from olist_snowflake_dbt_spark.operators.web import apply_blocklist

        bl = spark.createDataFrame(
            [
                ("shop.co.uk", "/news"),   # path-scoped block
                ("example.com", None),     # whole registrable domain
            ],
            "domain string, path_prefix string",
        )
        kept = {r.doc_id for r in apply_blocklist(self._docs(spark), bl).collect()}
        # 1 blocked (shop.co.uk + /news prefix); 2 survives (other path);
        # 3 survives (fine.co.uk is a DIFFERENT registrable domain —
        # a 2-label 'co.uk' match would wrongly kill it);
        # 4 blocked (domain-wide); 5 survives
        assert kept == {2, 3, 5}

    def test_blocklist_is_broadcast_anti_join(self, spark):
        from olist_snowflake_dbt_spark.operators.web import apply_blocklist

        bl = spark.createDataFrame(
            [("shop.co.uk", None)], "domain string, path_prefix string"
        )
        plan = apply_blocklist(self._docs(spark), bl)._jdf.queryExecution().executedPlan().toString()
        assert "LeftAnti" in plan and "Broadcast" in plan
        assert "Exchange hashpartitioning" not in plan


class TestPslWildcardException:
    """Round-11 full-PSL-algorithm rules: `*.` wildcards and `!`
    exceptions from the official-format snapshot."""

    def _reg(self, spark, hosts):
        from olist_snowflake_dbt_spark.operators.web import (
            with_registrable_domain,
        )

        df = spark.createDataFrame([(h,) for h in hosts], "host string")
        out = with_registrable_domain(df, "host")
        return {r.host: r.registrable_domain for r in out.collect()}

    def test_wildcard_ck(self, spark):
        got = self._reg(
            spark, ["a.foo.ck", "b.a.foo.ck", "foo.ck", "ck"]
        )
        # *.ck: every 2nd-level is a public suffix -> eTLD+1 is 3 labels
        assert got["a.foo.ck"] == "a.foo.ck"
        assert got["b.a.foo.ck"] == "a.foo.ck"
        # a bare wildcard suffix yields itself (fallback contract)
        assert got["foo.ck"] == "foo.ck"
        assert got["ck"] == "ck"

    def test_exception_www_ck_beats_wildcard(self, spark):
        got = self._reg(spark, ["www.ck", "sub.www.ck", "d.sub.www.ck"])
        # !www.ck: www.ck IS registrable (public suffix falls to 'ck')
        assert got["www.ck"] == "www.ck"
        assert got["sub.www.ck"] == "www.ck"
        assert got["d.sub.www.ck"] == "www.ck"

    def test_japanese_geographic_rules(self, spark):
        got = self._reg(
            spark,
            [
                "x.city.nagoya.jp",        # !city.nagoya.jp exception
                "city.nagoya.jp",
                "shop.naka.nagoya.jp",     # *.nagoya.jp wildcard
                "x.shop.naka.nagoya.jp",
                "site.pref.aichi.jp",      # plain 2-label rule aichi.jp
                "example.co.jp",           # organizational 2nd-level
            ],
        )
        assert got["x.city.nagoya.jp"] == "city.nagoya.jp"
        assert got["city.nagoya.jp"] == "city.nagoya.jp"
        assert got["shop.naka.nagoya.jp"] == "shop.naka.nagoya.jp"
        assert got["x.shop.naka.nagoya.jp"] == "shop.naka.nagoya.jp"
        assert got["site.pref.aichi.jp"] == "pref.aichi.jp"
        assert got["example.co.jp"] == "example.co.jp"

    def test_mixed_case_wildcard_exception(self, spark):
        got = self._reg(spark, ["WWW.CK", "Shop.Naka.NAGOYA.JP"])
        assert got["WWW.CK"] == "www.ck"
        assert got["Shop.Naka.NAGOYA.JP"] == "shop.naka.nagoya.jp"

    def test_snapshot_loader_roundtrip(self, spark):
        """The official-format parser: comments and sections dropped,
        all three rule kinds classified, single-label exact rules
        elided from the dim (identical to the implicit fallback)."""
        from olist_snowflake_dbt_spark.operators.web import (
            PUBLIC_SUFFIXES,
            _classify_rules,
            public_suffixes,
        )

        assert "co.uk" in PUBLIC_SUFFIXES
        assert "*.ck" in PUBLIC_SUFFIXES
        assert "!www.ck" in PUBLIC_SUFFIXES
        assert not any(r.startswith("//") for r in PUBLIC_SUFFIXES)
        kinds = {k for _, _, k in _classify_rules(PUBLIC_SUFFIXES)}
        assert kinds == {"rule", "wildcard", "exception"}
        dim = public_suffixes(spark)
        rows = {(r.suffix, r.kind) for r in dim.collect()}
        assert ("ck", "wildcard") in rows
        assert ("www.ck", "exception") in rows
        assert ("nagoya.jp", "wildcard") in rows
        assert ("city.nagoya.jp", "exception") in rows
        # 1-label exact rules elided; wildcard TAILS of 1 label kept
        assert ("com", "rule") not in rows

    def test_zero_shuffle_plan_with_full_snapshot(self, spark):
        from olist_snowflake_dbt_spark.operators.web import (
            with_registrable_domain,
        )

        df = spark.range(50).select(
            F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".www.ck"))
            .alias("host")
        )
        plan = (
            with_registrable_domain(df, "host")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
        assert "Exchange hashpartitioning" not in plan


class TestCapPrefilter:
    """Round-11 hot-host prefilter: output EXACTLY equals the
    unfiltered cap, the survivor guarantee is checked (not assumed),
    and the filter actually prunes the hot host before the window."""

    def _docs(self, spark):
        rows = [(i, f"http://hot.example.com/p/{i}") for i in range(4000)]
        rows += [
            (100000 + i, f"http://cold{i % 7}.example.org/p/{i}")
            for i in range(70)
        ]
        return spark.createDataFrame(rows, "doc_id long, url string")

    def test_prefiltered_equals_unfiltered(self, spark):
        from olist_snowflake_dbt_spark.operators.web import cap_per_host

        docs = self._docs(spark)
        plain = {
            (r.host, r.doc_id, r.host_rank)
            for r in cap_per_host(docs, "url", "doc_id", cap=25).collect()
        }
        fast = {
            (r.host, r.doc_id, r.host_rank)
            for r in cap_per_host(
                docs, "url", "doc_id", cap=25, prefilter_factor=8
            ).collect()
        }
        assert fast == plain and len(plain) == 25 + 70

    def test_prefilter_prunes_before_the_window(self, spark):
        """The hot host's 4000 rows shrink to ~factor*cap expected
        survivors before the rank — assert the filtered input the
        window sees is an order of magnitude smaller."""
        from pyspark.sql import functions as F

        from olist_snowflake_dbt_spark.operators.web import (
            canonicalize_url,
        )

        docs = self._docs(spark)
        u = canonicalize_url("url")
        wh = docs.withColumn("host", u["host"]).withColumn(
            "__cap_key",
            F.md5(
                F.concat(
                    F.lit("caphost"), u["canonical"],
                    F.col("doc_id").cast("string"),
                )
            ),
        )
        counts = wh.groupBy("host").agg(F.count(F.lit(1)).alias("__hn"))
        u32 = F.conv(F.substring("__cap_key", 1, 8), 16, 10).cast("bigint")
        budget = F.lit(8 * 25).cast("bigint")
        survivors = (
            wh.join(F.broadcast(counts), "host")
            .filter(
                (F.col("__hn") <= budget)
                | (u32 * F.col("__hn") < budget * F.lit(1 << 32))
            )
            .filter(F.col("host") == "hot.example.com")
            .count()
        )
        assert 25 <= survivors < 800  # ~200 expected vs 4000 input

    def test_factor_guard(self, spark):
        import pytest as _pytest

        from olist_snowflake_dbt_spark.operators.web import cap_per_host

        with _pytest.raises(ValueError, match="prefilter_factor"):
            cap_per_host(
                self._docs(spark), "url", "doc_id",
                cap=5, prefilter_factor=1,
            )

    @staticmethod
    def _adversarial_salt(canon, floor_bits):
        """Search a salt under which EVERY md5(salt||canonical||id)
        prefix of the host's rows lands at or above 2**floor_bits —
        i.e. the hash-threshold prefilter would drop them all.
        Deterministic given md5; expected hits within a few hundred
        salts for 8 rows."""
        import hashlib

        return next(
            s
            for s in (f"s{j}" for j in range(4096))
            if all(
                int(
                    hashlib.md5(f"{s}{c}{i}".encode()).hexdigest()[:8], 16
                )
                >= (1 << floor_bits)
                for i, c in canon
            )
        )

    def test_shortfall_hard_fails_at_action_time(self, spark):
        """Round-11 advisory, round-13 mechanism: a host delivering
        fewer than min(cap, |host|) prefilter survivors must hard-fail.
        The verifier now rides IN the plan (assert_true on the
        survivor-count window), so the failure surfaces when the
        caller's action runs. Salt searched so all 8 rows fall above
        the cap=2/factor=2 threshold (u32 < 2^31): the min-key escape
        keeps exactly ONE survivor — a shortfall against min(2, 8)."""
        import pytest as _pytest

        from olist_snowflake_dbt_spark.operators.web import cap_per_host

        rows = [(i, f"http://bad.example.com/p/{i}") for i in range(8)]
        docs = spark.createDataFrame(rows, "doc_id long, url string")
        # canonical = host || path (scheme stripped, no www/params here)
        canon = [(i, f"bad.example.com/p/{i}") for i in range(8)]
        # cap=2, factor=2 -> budget=4; survive iff u32 * 8 < 4 * 2^32,
        # i.e. u32 < 2^31 — the salt makes every row fail that
        salt = self._adversarial_salt(canon, 31)
        with _pytest.raises(Exception, match="under-delivered"):
            cap_per_host(
                docs, "url", "doc_id", cap=2, salt=salt, prefilter_factor=2
            ).collect()

    def test_min_key_escape_keeps_cap1_exact(self, spark):
        """The worst case the round-11 wipeout test exercised — every
        row of a host above the threshold — can no longer drop the
        host: the per-host min-key row always survives, it IS the true
        rank-1 row, and at cap=1 the output matches the unfiltered
        window exactly with no error raised."""
        from olist_snowflake_dbt_spark.operators.web import cap_per_host

        rows = [(i, f"http://bad.example.com/p/{i}") for i in range(8)]
        docs = spark.createDataFrame(rows, "doc_id long, url string")
        canon = [(i, f"bad.example.com/p/{i}") for i in range(8)]
        # cap=1, factor=2 -> budget=2; survive iff u32 < 2^30 — the
        # salt drops every row, leaving only the min-key escape
        salt = self._adversarial_salt(canon, 30)
        plain = {
            (r.host, r.doc_id, r.host_rank)
            for r in cap_per_host(
                docs, "url", "doc_id", cap=1, salt=salt
            ).collect()
        }
        fast = {
            (r.host, r.doc_id, r.host_rank)
            for r in cap_per_host(
                docs, "url", "doc_id", cap=1, salt=salt, prefilter_factor=2
            ).collect()
        }
        assert fast == plain and len(plain) == 1


class TestCapTwoPhase:
    """Round-13 salted two-phase top-k: unconditionally exact, and the
    stage-1 bucket windows actually bound what any one task sorts."""

    def _docs(self, spark):
        rows = [(i, f"http://hot.example.com/p/{i}") for i in range(4000)]
        rows += [
            (100000 + i, f"http://cold{i % 7}.example.org/p/{i}")
            for i in range(70)
        ]
        return spark.createDataFrame(rows, "doc_id long, url string")

    def test_two_phase_equals_plain(self, spark):
        from olist_snowflake_dbt_spark.operators.web import cap_per_host

        docs = self._docs(spark)
        plain = {
            (r.host, r.doc_id, r.host_rank)
            for r in cap_per_host(docs, "url", "doc_id", cap=25).collect()
        }
        fast = {
            (r.host, r.doc_id, r.host_rank)
            for r in cap_per_host(
                docs, "url", "doc_id", cap=25, salt_buckets=8
            ).collect()
        }
        assert fast == plain and len(plain) == 25 + 70

    def test_two_phase_exact_when_cap_exceeds_host(self, spark):
        """Hosts smaller than cap keep everything — ranks must stay
        dense 1..|host| after the two-phase recombination."""
        from olist_snowflake_dbt_spark.operators.web import cap_per_host

        docs = self._docs(spark).filter("doc_id >= 100000")  # 7 cold hosts
        out = cap_per_host(
            docs, "url", "doc_id", cap=100, salt_buckets=4
        ).collect()
        assert len(out) == 70
        by_host = {}
        for r in out:
            by_host.setdefault(r.host, []).append(r.host_rank)
        assert all(
            sorted(v) == list(range(1, len(v) + 1)) for v in by_host.values()
        )

    def test_knobs_mutually_exclusive_and_guard(self, spark):
        import pytest as _pytest

        from olist_snowflake_dbt_spark.operators.web import cap_per_host

        docs = self._docs(spark)
        with _pytest.raises(ValueError, match="mutually exclusive"):
            cap_per_host(
                docs, "url", "doc_id", cap=5,
                prefilter_factor=8, salt_buckets=8,
            )
        with _pytest.raises(ValueError, match="salt_buckets"):
            cap_per_host(docs, "url", "doc_id", cap=5, salt_buckets=1)

    def test_two_phase_stage1_splits_the_hot_partition(self, spark):
        """Plan-shape pin: stage 1's window exchange must hash on
        (host, bucket) — the hot host's rows land in salt_buckets
        different partitions — and a second Window follows for the
        exact host-level re-rank."""
        from olist_snowflake_dbt_spark.operators.web import cap_per_host

        plan = (
            cap_per_host(
                self._docs(spark), "url", "doc_id", cap=5, salt_buckets=8
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Window") >= 2
        # the stage-1 exchange key carries the xxhash bucket term
        assert "xxhash64" in plan and "pmod" in plan


class TestCapVariantsProperty:
    """Hypothesis pin for the round-13 cap surface: for ARBITRARY url
    corpora (skewed hosts, shared canonicals, singleton hosts) all
    three strategies — plain window, hash-threshold prefilter, salted
    two-phase — return the identical survivor set with identical
    ranks. Example count small; each example pays Spark jobs."""

    def test_all_cap_variants_agree(self, spark):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from olist_snowflake_dbt_spark.operators.web import cap_per_host

        corpus = st.lists(
            st.tuples(
                st.integers(0, 500),        # doc_id
                st.integers(0, 4),          # host index (skew via dups)
                st.integers(0, 6),          # path index (shared canonicals)
            ),
            min_size=1,
            max_size=40,
            unique_by=lambda t: t[0],
        )

        @settings(
            max_examples=6,
            deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        @given(corpus=corpus, cap=st.integers(1, 5))
        def run(corpus, cap):
            rows = [
                (i, f"http://h{h}.example.com/p/{p}") for i, h, p in corpus
            ]
            df = spark.createDataFrame(rows, "doc_id long, url string")
            key = lambda r: (r.host, r.doc_id, r.host_rank)  # noqa: E731
            plain = {
                key(r)
                for r in cap_per_host(df, "url", "doc_id", cap=cap).collect()
            }
            pre = {
                key(r)
                for r in cap_per_host(
                    df, "url", "doc_id", cap=cap, prefilter_factor=8
                ).collect()
            }
            two = {
                key(r)
                for r in cap_per_host(
                    df, "url", "doc_id", cap=cap, salt_buckets=4
                ).collect()
            }
            assert pre == plain and two == plain

        run()


class TestCapAuto:
    """Round-14 measured strategy selection: salt_buckets='auto' runs a
    key_skew_stats pre-flight and picks plain below the hot-host
    threshold, two-phase (with hot-size-derived buckets) above it —
    output-identical either way."""

    def _docs(self, spark):
        rows = [(i, f"http://hot.example.com/p/{i}") for i in range(3000)]
        rows += [
            (100000 + i, f"http://cold{i % 7}.example.org/p/{i}")
            for i in range(70)
        ]
        return spark.createDataFrame(rows, "doc_id long, url string")

    def test_auto_picks_plain_below_threshold_same_output(self, spark):
        from olist_snowflake_dbt_spark.operators.web import cap_per_host

        docs = self._docs(spark)
        plain = {
            (r.host, r.doc_id, r.host_rank)
            for r in cap_per_host(docs, "url", "doc_id", cap=25).collect()
        }
        # hottest host = 3000 rows, threshold default 2M -> plain branch
        auto_df = cap_per_host(
            docs, "url", "doc_id", cap=25, salt_buckets="auto"
        )
        got = {(r.host, r.doc_id, r.host_rank) for r in auto_df.collect()}
        assert got == plain
        # plain branch = single host-level window, no bucket stage
        plan = (
            auto_df._jdf.queryExecution().executedPlan().toString()
        ).split("Initial Plan")[0]
        assert len(re.findall(r"Window \[", plan)) == 1

    def test_auto_picks_two_phase_above_threshold_same_output(self, spark):
        from olist_snowflake_dbt_spark.operators.web import cap_per_host

        docs = self._docs(spark)
        plain = {
            (r.host, r.doc_id, r.host_rank)
            for r in cap_per_host(docs, "url", "doc_id", cap=25).collect()
        }
        auto_df = cap_per_host(
            docs, "url", "doc_id", cap=25,
            salt_buckets="auto", auto_hot_threshold=100,
        )
        got = {(r.host, r.doc_id, r.host_rank) for r in auto_df.collect()}
        assert got == plain
        # two-phase branch: stage-1 bucket window + exact re-rank
        plan = (
            auto_df._jdf.queryExecution().executedPlan().toString()
        ).split("Initial Plan")[0]
        assert len(re.findall(r"Window \[", plan)) == 2

    def test_auto_rejects_unknown_string(self, spark):
        import pytest as _pytest

        from olist_snowflake_dbt_spark.operators.web import cap_per_host

        with _pytest.raises(ValueError, match="'auto'"):
            cap_per_host(
                self._docs(spark), "url", "doc_id", cap=5,
                salt_buckets="turbo",
            )


class TestRobotsGate:
    """RFC 9309 path-rule verdict: longest prefix wins, allow wins
    length ties, absent rules default to allowed."""

    def _out(self, spark, rules):
        from olist_snowflake_dbt_spark.operators.web import robots_gate

        urls = [
            (1, "http://a.example.com/docs/10"),
            (2, "http://a.example.com/blog/x"),
            (3, "http://b.example.com/anything"),
            (4, "http://c.example.com/free"),
            (5, "http://a.example.com/docs/2"),
        ]
        df = spark.createDataFrame(urls, "doc_id long, url string")
        r = spark.createDataFrame(
            rules, "host string, path_prefix string, allow boolean"
        )
        return {
            row.doc_id: row.robots_allowed
            for row in robots_gate(df, r, "url", "doc_id").collect()
        }

    def test_longest_prefix_wins_and_defaults(self, spark):
        out = self._out(
            spark,
            [
                ("a.example.com", "/docs", False),
                ("a.example.com", "/docs/1", True),
                ("b.example.com", "", False),
            ],
        )
        assert out[1] is True, "/docs/1 allow out-lengths /docs disallow"
        assert out[5] is False, "/docs/2 hits only the /docs disallow"
        assert out[2] is True, "no matching rule -> allowed"
        assert out[3] is False, "empty prefix blocks the whole host"
        assert out[4] is True, "host without rules -> allowed"

    def test_equal_length_tie_allow_wins(self, spark):
        out = self._out(
            spark,
            [
                ("a.example.com", "/docs", False),
                ("a.example.com", "/docs", True),
            ],
        )
        assert out[1] is True and out[5] is True
