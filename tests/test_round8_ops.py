"""Round-8 operators: cluster representatives, per-group reservoir,
mixture weights, sliding-window chunking, funnel ordering semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olist_snowflake_dbt_spark.operators.dedup import cluster_representative
from olist_snowflake_dbt_spark.operators.sampling import (
    chunk_windows,
    mixture_weights,
    reservoir_per_group,
)


def test_cluster_representative_picks_best_and_singletons(spark):
    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (4, 5), (9, 7)],
        "doc_id int, quality int",
    )
    # 1-2-3 form one cluster via transitive pairs; 4 and 9 are singletons
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a int, id_b int")
    out = {r.component: r for r in
           cluster_representative(docs, pairs, "doc_id", "quality").collect()}
    assert set(out) == {1, 4, 9}
    win = out[1]
    assert win.doc_id == 2  # max quality 30, tie -> smaller id (2 beats 3)
    assert win.quality == 30 and win.n_cluster_members == 3
    assert out[4].doc_id == 4 and out[4].n_cluster_members == 1


def test_reservoir_per_group_exact_deterministic(spark):
    df = spark.createDataFrame(
        [(g, i) for g in ("a", "b") for i in range(50)] + [("tiny", 0)],
        "g string, id int",
    )
    out = reservoir_per_group(df, "g", "id", 5)
    counts = {r.g: r.n for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert counts == {"a": 5, "b": 5, "tiny": 1}  # min(n, |group|)
    again = reservoir_per_group(df, "g", "id", 5)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))
    other = reservoir_per_group(df, "g", "id", 5, salt="x")
    assert sorted(map(tuple, out.collect())) != sorted(map(tuple, other.collect()))
    with pytest.raises(ValueError):
        reservoir_per_group(df, "g", "id", 0)


def test_mixture_weights_flattens_toward_rare(spark):
    df = spark.createDataFrame(
        [("big",)] * 900 + [("small",)] * 100, "src string"
    )
    out = {r.src: r for r in mixture_weights(df, "src").collect()}
    shares = {"big": 0.9, "small": 0.1}
    # temperature flattening: big damped below its share, small raised
    assert out["big"].weight < shares["big"]
    assert out["small"].weight > shares["small"]
    assert abs(out["big"].weight + out["small"].weight - 1.0) < 1e-9
    # most down-sampled source has the LOWEST acceptance rate; max is 1.0
    assert out["small"].rate_vs_max == 1.0
    assert out["big"].rate_vs_max < 1.0


def test_chunk_windows_layout(spark):
    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(1, text), (2, "a b c")], "id int, text string")
    out = chunk_windows(df, "id", F.split("text", " "), window=4, stride=2)
    rows = sorted(map(tuple, out.collect()))
    # doc 1: 10 words -> starts 0,2,4,6 (full windows only)
    d1 = [r for r in rows if r[0] == 1]
    assert [(r[1], r[2], r[3]) for r in d1] == [
        (0, 0, 4), (1, 2, 4), (2, 4, 4), (3, 6, 4)
    ]
    assert d1[1][4] == "w2 w3 w4 w5"
    # doc 2: shorter than one window -> single short chunk
    d2 = [r for r in rows if r[0] == 2]
    assert [(r[1], r[2], r[3], r[4]) for r in d2] == [(0, 0, 3, "a b c")]
    with pytest.raises(ValueError):
        chunk_windows(df, "id", F.split("text", " "), window=0, stride=1)


def test_funnel_requires_order(spark, monkeypatch):
    """A purchase BEFORE any click must not count as converted, and a
    click before signup must not start the funnel."""
    import olist_snowflake_dbt_spark.queries_sql_breadth as B

    rows = [
        # user 1: proper order -> full funnel
        (1, "2024-01-01 00:00:00", 1, "signup"),
        (2, "2024-01-01 00:10:00", 1, "click"),
        (3, "2024-01-01 00:20:00", 1, "purchase"),
        # user 2: purchase before click -> stops at click stage
        (4, "2024-01-02 00:00:00", 2, "signup"),
        (5, "2024-01-02 00:05:00", 2, "purchase"),
        (6, "2024-01-02 00:10:00", 2, "click"),
        # user 3: click before signup -> only signup counted
        (7, "2024-01-03 00:00:00", 3, "click"),
        (8, "2024-01-03 00:10:00", 3, "signup"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    monkeypatch.setattr(B, "_t", lambda s, d, n: ev)
    out = {r.stage: r for r in B.q_funnel_conversion(spark, "ignored").collect()}
    assert out["signup"].n_users == 3
    assert out["click_after_signup"].n_users == 2  # users 1 and 2
    assert out["purchase_after_click"].n_users == 1  # user 1 only
    assert out["purchase_after_click"].sum_lag_ms == 10 * 60 * 1000

def test_bigram_lm_score_semantics(spark):
    from olist_snowflake_dbt_spark.operators.text import bigram_lm_score

    model = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran"), (3, "x")],
        "doc_id int, text string",
    )
    score = spark.createDataFrame(
        [(10, "the cat"), (11, "cat zzz"), (12, "q")],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in bigram_lm_score(model, score).collect()}
    # vocab = {the,cat,sat,ran,x} = 5; c1(the)=2, c2(the,cat)=2
    assert out[10].n_bigrams == 1
    assert out[10].sum_p_nano == int((2 + 1) / (2 + 5) * 1e9)
    # unseen bigram with seen prefix: (0+1)/(c1(cat)=2 + 5)
    assert out[11].sum_p_nano == int((0 + 1) / (2 + 5) * 1e9)
    assert out[10].avg_p > out[11].avg_p  # in-model text scores higher
    # too short to form a bigram: present with NULL score
    assert out[12].n_bigrams == 0 and out[12].avg_p is None


def test_drift_chi2_detects_shift(spark):
    from olist_snowflake_dbt_spark.operators.monitoring import drift_chi2

    ref = spark.createDataFrame([("a",)] * 50 + [("b",)] * 50, "f string")
    same = spark.createDataFrame([("a",)] * 25 + [("b",)] * 25, "f string")
    shifted = spark.createDataFrame(
        [("a",)] * 45 + [("b",)] * 5 + [("c",)] * 10, "f string"
    )
    calm = drift_chi2(ref, same, "f").agg(
        F.sum("chi2_contrib_micro").alias("s")).first().s
    drift = drift_chi2(ref, shifted, "f").agg(
        F.sum("chi2_contrib_micro").alias("s")).first().s
    assert drift > calm  # shifted window scores far higher
    rows = {r.f: r for r in drift_chi2(ref, shifted, "f").collect()}
    assert rows["c"].n_ref == 0  # unseen category is finite, not an error
    assert rows["c"].chi2_contrib_micro > 0


def test_context_pack_prefix_cut(spark):
    from olist_snowflake_dbt_spark.operators.retrieval import context_pack

    ranked = spark.createDataFrame(
        [(1, 10, 1, 50), (1, 20, 2, 40), (1, 30, 3, 200), (1, 40, 4, 5),
         (2, 50, 1, 999)],
        "query_id int, doc_id int, rank int, n_tokens int",
    )
    out = context_pack(ranked, "n_tokens", budget=100).collect()
    got = sorted((r.query_id, r.doc_id, r.cum_tokens) for r in out)
    # q1: ranks 1-2 fit (90); rank 3 overflows and rank 4 must NOT
    # sneak in after it (prefix cut, not knapsack). q2: top doc alone
    # overflows -> empty context.
    assert got == [(1, 10, 50), (1, 20, 90)]
    import pytest as _pt
    with _pt.raises(ValueError):
        context_pack(ranked, "n_tokens", budget=0)


def test_table_size_advice_model(spark):
    from olist_snowflake_dbt_spark.operators.skew import table_size_advice

    small = spark.createDataFrame(
        [(1, "ab"), (2, "abcd")], "id bigint, s string"
    )
    big = spark.createDataFrame(
        [(i, "x" * 100) for i in range(200)], "id bigint, s string"
    )
    out = {r.table_name: r for r in
           table_size_advice({"small": small, "big": big},
                             broadcast_threshold_bytes=1000).collect()}
    # 8 bytes for the bigint + floor(mean(2,4)) = 3 for the string
    assert out["small"].est_row_bytes == 11
    assert out["small"].est_total_bytes == 22
    assert out["small"].strategy == "broadcast"
    assert out["big"].est_row_bytes == 108
    assert out["big"].strategy == "shuffle"
    import pytest as _pt
    with _pt.raises(ValueError):
        table_size_advice({})
    with _pt.raises(ValueError):
        table_size_advice({"m": small.select(F.create_map("s", "s").alias("m"))})


def test_multi_table_insert_first_match_and_atomicity(spark, tmp_path):
    from olist_snowflake_dbt_spark.plans.materialize import multi_table_insert

    df = spark.createDataFrame(
        [(1, 250), (2, 100), (3, 10), (4, 60)], "id int, v int"
    )
    routes = {
        "hi": F.col("v") >= 200,
        "mid": F.col("v") >= 50,  # first-match: hi rows must NOT land here
        "lo": F.lit(True),
    }
    rels = multi_table_insert(spark, df, "__r", routes, str(tmp_path))
    got = {n: sorted(r.id for r in rel.df.collect()) for n, rel in rels.items()}
    assert got == {"hi": [1], "mid": [2, 4], "lo": [3]}
    assert "__r" not in rels["hi"].df.columns  # tag stays internal
    # second run replaces, not appends
    rels2 = multi_table_insert(spark, df, "__r", routes, str(tmp_path))
    assert rels2["mid"].df.count() == 2
    # empty route publishes an empty readable table
    rels3 = multi_table_insert(
        spark, df.filter("v > 1000"), "__r", {"only": F.lit(True)}, str(tmp_path)
    )
    assert rels3["only"].df.count() == 0
    with pytest.raises(ValueError):
        multi_table_insert(spark, df, "id", routes, str(tmp_path))
    with pytest.raises(ValueError):
        multi_table_insert(spark, df, "__r", {}, str(tmp_path))


def test_result_cache_hit_miss_invalidate(spark, tmp_path):
    from olist_snowflake_dbt_spark.plans.result_cache import ResultCache

    cache = ResultCache(spark, str(tmp_path))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string")
    q1 = df.groupBy("s").count()
    r1, hit1 = cache.get_or_compute(q1)
    assert hit1 is False
    r2, hit2 = cache.get_or_compute(df.groupBy("s").count())
    assert hit2 is True  # logically-equal plan -> same key
    assert sorted(map(tuple, r2.collect())) == sorted(map(tuple, r1.collect()))
    # a different literal is a different plan -> miss
    _, hit3 = cache.get_or_compute(df.filter("id > 1").groupBy("s").count())
    assert hit3 is False
    assert cache.invalidate(q1) == 1
    _, hit4 = cache.get_or_compute(q1)
    assert hit4 is False  # recomputed after invalidation
    assert cache.invalidate() >= 1  # drop-all returns count


def test_multi_table_insert_crash_mid_promotion(spark, tmp_path, monkeypatch):
    """A crash during the promotion loop must leave every already-
    published table generation intact and readable."""
    from olist_snowflake_dbt_spark.plans import materialize as m

    df = spark.createDataFrame([(1, 300), (2, 10)], "id int, v int")
    routes = {"hi": F.col("v") >= 200, "lo": F.lit(True)}
    # publish generation 1 for both targets
    m.multi_table_insert(spark, df, "__r", routes, str(tmp_path))

    real_swap = m._atomic_swap
    calls = {"n": 0}

    def failing_swap(final, tmp):
        calls["n"] += 1
        if calls["n"] == 2:  # second target's promotion dies
            raise OSError("crash mid-promotion")
        real_swap(final, tmp)

    monkeypatch.setattr(m, "_atomic_swap", failing_swap)
    df2 = spark.createDataFrame([(3, 300), (4, 10)], "id int, v int")
    with pytest.raises(OSError):
        m.multi_table_insert(spark, df2, "__r", routes, str(tmp_path))
    monkeypatch.undo()
    # first target advanced to gen 2, second still serves gen 1 fully
    names = sorted(routes)  # dict order == promotion order: hi, lo
    hi = spark.read.parquet(str(tmp_path / "hi"))
    lo = spark.read.parquet(str(tmp_path / "lo"))
    assert sorted(r.id for r in hi.collect()) == [3]  # promoted before crash
    assert sorted(r.id for r in lo.collect()) == [2]  # old gen intact
    assert names == ["hi", "lo"]
    # no stage litter survives
    litter = [e for e in (tmp_path).iterdir() if e.name.startswith(".mti-stage")]
    assert litter == []


def test_result_cache_concurrent_publish_race(spark, tmp_path, monkeypatch):
    """Two concurrent misses of the same key: the loser of the rename
    race discards its tmp dir and serves the winner's entry."""
    from olist_snowflake_dbt_spark.plans.result_cache import ResultCache

    cache = ResultCache(spark, str(tmp_path))
    df = spark.createDataFrame([(1, "a")], "id int, s string")
    q = df.groupBy("s").count()
    # simulate the racing winner: while OUR publish is in flight, the
    # other session's entry appears before our exists-check
    import olist_snowflake_dbt_spark.plans.result_cache as rcm

    real_exists = rcm.os.path.exists
    key = cache._key(q)
    final = cache._entry(key)

    def racing_exists(p):
        if p == final and not real_exists(p):
            # the other session publishes NOW, between our write and
            # our exists-check
            import json as js
            import os as o

            tmp2 = f"{final}.race"
            q.write.mode("overwrite").parquet(tmp2)
            with open(o.path.join(tmp2, "_manifest.json"), "w") as f:
                js.dump({"key": key}, f)
            o.rename(tmp2, final)
        return real_exists(p)

    monkeypatch.setattr(rcm.os.path, "exists", racing_exists)
    served, hit = cache.get_or_compute(q)
    monkeypatch.undo()
    assert hit is False  # we computed
    assert [tuple(r) for r in served.collect()] == [("a", 1)]
    # our tmp was discarded: only the one published entry remains
    entries = [e for e in tmp_path.iterdir() if e.is_dir() and key in e.name]
    assert len(entries) == 1


def test_schema_drift_report(spark):
    from olist_snowflake_dbt_spark.operators.profiling import schema_drift

    old = spark.createDataFrame([(1, "a", 1.0)], "id int, s string, x double")
    new = spark.createDataFrame([(1, "a", 2)], "id bigint, s string, y int")
    got = {r.column: r for r in schema_drift(old, new).collect()}
    assert set(got) == {"id", "x", "y"}  # s unchanged -> omitted
    assert (got["id"].change, got["id"].old_type, got["id"].new_type) == (
        "type_changed", "int", "bigint")
    assert (got["x"].change, got["x"].new_type) == ("removed", None)
    assert (got["y"].change, got["y"].old_type) == ("added", None)
    # identical schemas -> empty report (the contract held)
    assert schema_drift(old, old).count() == 0
    # column REORDER is not drift
    assert schema_drift(old, old.select("x", "id", "s")).count() == 0


# ---------------------------------------------------------------------
# round 13: two-sample KS drift gate
# ---------------------------------------------------------------------


class TestKSTwoSample:
    def test_identical_samples_never_reject(self, spark):
        from olist_snowflake_dbt_spark.operators.monitoring import ks_two_sample

        df = spark.createDataFrame([(float(i % 7),) for i in range(50)], "v double")
        r = ks_two_sample(df, df, "v").collect()[0]
        assert r.d_scaled == 0 and r.ks_micro == 0 and not r.reject

    def test_disjoint_samples_hit_ks_one_and_reject(self, spark):
        from olist_snowflake_dbt_spark.operators.monitoring import ks_two_sample

        ref = spark.createDataFrame([(float(i),) for i in range(30)], "v double")
        cur = spark.createDataFrame([(float(100 + i),) for i in range(40)], "v double")
        r = ks_two_sample(ref, cur, "v").collect()[0]
        assert r.d_scaled == 30 * 40
        assert r.ks_micro == 1_000_000
        assert r.reject

    def test_hand_computed_small_case(self, spark):
        from olist_snowflake_dbt_spark.operators.monitoring import ks_two_sample

        ref = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "v double")
        cur = spark.createDataFrame([(2.0,), (3.0,), (4.0,)], "v double")
        r = ks_two_sample(ref, cur, "v").collect()[0]
        # gaps at x=1,2,3,4 are 3,3,3,0 over denominator 9 -> D = 1/3
        assert r.d_scaled == 3
        assert r.ks_micro == 333_333
