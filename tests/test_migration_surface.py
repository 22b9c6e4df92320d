"""Semantics tests for the Snowflake-migration SQL surface
(queries_migration.py): ordered LISTAGG, QUALIFY keep-latest, LATERAL
FLATTEN with ordinality, deterministic discrete median/mode."""

from __future__ import annotations

from pyspark.sql import functions as F

from olist_snowflake_dbt_spark.queries import QUERIES
from olist_snowflake_dbt_spark.sources.readers import read_table


def test_listagg_is_ordered_and_partition_invariant(spark, sf_dir):
    out = QUERIES["listagg_within_group"](spark, sf_dir)
    rows = {r.l_orderkey: r for r in out.collect()}
    li = (
        read_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 8 == 0)
        .select("l_orderkey", "l_linenumber", "l_returnflag")
        .collect()
    )
    by_key: dict[int, list] = {}
    for r in li:
        by_key.setdefault(r.l_orderkey, []).append(
            (r.l_linenumber, r.l_returnflag)
        )
    assert set(rows) == set(by_key)
    for k, pairs in by_key.items():
        want = ",".join(v for _, v in sorted(pairs))
        assert rows[k].flags_csv == want
        assert rows[k].n_lines == len(pairs)
    # partition-invariance: a different parallelism must not change the
    # aggregate-internal ordering (array_sort pins it; collect order alone
    # would not)
    redo = {
        r.l_orderkey: r.flags_csv
        for r in QUERIES["listagg_within_group"](spark, sf_dir)
        .repartition(7)
        .collect()
    }
    assert redo == {k: r.flags_csv for k, r in rows.items()}


def test_qualify_keeps_exactly_latest_per_user(spark, sf_dir):
    out = QUERIES["qualify_keep_latest"](spark, sf_dir)
    got = {r.user_id: r for r in out.collect()}
    ev = read_table(spark, sf_dir, "events").collect()
    latest: dict[int, tuple] = {}
    for r in ev:
        key = (r.ts, r.event_id)
        if r.user_id not in latest or key > latest[r.user_id][0]:
            latest[r.user_id] = (key, r)
    assert set(got) == set(latest)
    for uid, (_, r) in latest.items():
        g = got[uid]
        assert (g.last_event_id, g.last_event_type, g.last_value) == (
            r.event_id,
            r.event_type,
            r.value,
        )


def test_qualify_tiebreak_prefers_higher_event_id(spark):
    df = spark.createDataFrame(
        [
            (1, 100, "2024-01-01 00:00:00", "a", 1.0),
            (1, 200, "2024-01-01 00:00:00", "b", 2.0),
        ],
        "user_id long, event_id long, ts string, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = QUERIES["qualify_keep_latest"](spark, d).collect()
    assert len(out) == 1 and out[0].last_event_id == 200


def test_flatten_pos_is_one_based_and_capped(spark, sf_dir):
    out = QUERIES["flatten_with_ordinality"](spark, sf_dir)
    rows = out.collect()
    assert rows, "expected fan-out rows"
    docs = {
        r.doc_id: r.text
        for r in read_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 16 == 0)
        .collect()
    }
    by_doc: dict[int, dict[int, str]] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.pos] = r.word
    for doc_id, words in by_doc.items():
        split = docs[doc_id].split(" ")
        assert sorted(words) == list(range(1, min(len(split), 5) + 1))
        for pos, w in words.items():
            assert w == split[pos - 1]


def test_median_mode_deterministic_on_planted_ties(spark, tmp_path):
    # even count → lower median; mode tie (two values ×2) → smaller value
    data = [
        (i, f"2024-01-01 00:00:{i:02d}", 1, "t", v)
        for i, v in enumerate([4.0, 2.0, 2.0, 4.0, 9.0, 1.0])
    ]
    df = spark.createDataFrame(
        data, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.write.parquet(str(tmp_path / "events.parquet"))
    out = QUERIES["median_mode_disc"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    # sorted values: 1,2,2,4,4,9 → lower median rank (6+1)//2=3 → 2.0;
    # p90 rank ceil(5.4)=6 → 9.0; mode tie {2.0:2, 4.0:2} → 2.0
    assert (r.median_value, r.p90_value, r.mode_value) == (2.0, 9.0, 2.0)


def test_qualify_single_exchange_plan(spark, sf_dir):
    plan = (
        QUERIES["qualify_keep_latest"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan


def test_second_wave_plan_shapes_are_pinned(spark, sf_dir):
    """Exchange-count pins for the audited plans — a silent regression
    to a join-heavier or shuffle-heavier formulation fails here before
    it costs anything at scale."""
    expected = {
        "listagg_within_group": 1,   # one hash aggregate, no window
        "web_cap_per_host": 1,       # map-only canon + one host window
        "web_host_url_stats": 2,     # host agg + distinct-Expand pass
        "median_mode_disc": 4,       # ranked window+fold, freq, mode, join
    }
    from olist_snowflake_dbt_spark.queries import QUERIES

    for name, n in expected.items():
        plan = (
            QUERIES[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange") <= n, f"{name} grew: {plan}"
        assert "CartesianProduct" not in plan


def test_conditional_events_semantics_and_single_exchange(spark, sf_dir):
    """window_conditional_events: the change counter starts at 0 per
    partition and increments exactly on type changes; the whole trio
    (two running sums + lag + partition total) shares ONE exchange."""
    df = QUERIES["window_conditional_events"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1

    ev = read_table(spark, sf_dir, "events")
    one_user = (
        ev.groupBy("user_id").count().orderBy(F.desc("count")).first().user_id
    )
    seq = [
        (r.event_type, r.cond_true_events, r.cond_change_events, r.value_ppm)
        for r in df.join(
            ev.select("event_id", "event_type"), "event_id"
        )
        .filter(F.col("user_id") == one_user)
        .join(ev.select("event_id", "ts"), "event_id")
        .orderBy("ts", "event_id")
        .collect()
    ]
    assert seq[0][2] == 0  # first row of a partition: zero changes seen
    # replay both counters in Python
    truth_true = truth_chg = 0
    prev = None
    for et, ct, cc, _ in seq:
        if et == "purchase":
            truth_true += 1
        if prev is not None and et != prev:
            truth_chg += 1
        assert (ct, cc) == (truth_true, truth_chg)
        prev = et
    # ppm shares sum to ~1e6 (floor-div remainder only)
    total_ppm = sum(p for *_, p in seq)
    assert 1_000_000 - len(seq) <= total_ppm <= 1_000_000
