"""scd2_resolve_asof (snapshot consumption) + the metrics semantic layer."""

from __future__ import annotations

from datetime import datetime

import pyspark.sql.functions as F
import pytest

from olist_snowflake_dbt_spark.operators.snapshots import scd2_resolve_asof
from olist_snowflake_dbt_spark.plans.metrics import Metric, query_metric


def _ts(rows):
    return [
        tuple(
            datetime.fromisoformat(v)
            if isinstance(v, str) and v[:2] == "20" and ":" in v
            else v
            for v in r
        )
        for r in rows
    ]


def _snap(spark, rows):
    return spark.createDataFrame(
        _ts(rows), "k bigint, state string, dbt_valid_from timestamp, ord bigint"
    )


def _facts(spark, rows):
    return spark.createDataFrame(_ts(rows), "fid bigint, k bigint, ts timestamp")


def test_resolve_picks_version_valid_at_fact_time(spark):
    snap = _snap(
        spark,
        [
            (1, "v1", "2024-01-01 00:00:00", 1),
            (1, "v2", "2024-02-01 00:00:00", 2),
        ],
    )
    facts = _facts(
        spark,
        [
            (10, 1, "2024-01-15 00:00:00"),  # inside v1
            (11, 1, "2024-02-01 00:00:00"),  # boundary: v2 (>= valid_from)
            (12, 1, "2023-12-01 00:00:00"),  # before history -> NULL
        ],
    )
    out = {
        r.fid: r.state
        for r in scd2_resolve_asof(
            facts, snap, ["k"], "ts", ["state"], dim_order="ord"
        ).collect()
    }
    assert out == {10: "v1", 11: "v2", 12: None}


def test_resolve_zero_width_version_loses(spark):
    """Two versions opening at the same instant: the later (by
    dim_order) wins — the zero-width one is never resolvable, matching
    the BETWEEN-join semantics the oracle uses."""
    snap = _snap(
        spark,
        [
            (1, "dead", "2024-01-01 00:00:00", 1),
            (1, "live", "2024-01-01 00:00:00", 2),
        ],
    )
    facts = _facts(spark, [(10, 1, "2024-06-01 00:00:00")])
    [r] = scd2_resolve_asof(
        facts, snap, ["k"], "ts", ["state"], dim_order="ord"
    ).collect()
    assert r.state == "live"


def test_resolve_keys_do_not_leak(spark):
    snap = _snap(spark, [(1, "a", "2024-01-01 00:00:00", 1)])
    facts = _facts(spark, [(10, 2, "2024-06-01 00:00:00")])
    [r] = scd2_resolve_asof(facts, snap, ["k"], "ts", ["state"]).collect()
    assert r.state is None and r.dbt_valid_from is None


def test_resolve_plan_has_no_inequality_join(spark):
    """The as-of plan must be window-based — no BroadcastNestedLoop /
    CartesianProduct from an interval join."""
    snap = _snap(spark, [(1, "a", "2024-01-01 00:00:00", 1)])
    facts = _facts(spark, [(10, 1, "2024-06-01 00:00:00")])
    plan = (
        scd2_resolve_asof(facts, snap, ["k"], "ts", ["state"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan


# ----------------------------------------------------------- metrics
@pytest.fixture(scope="module")
def model(spark):
    return spark.createDataFrame(
        _ts([
            (1, "A", "2024-01-10 00:00:00", 10.50),
            (2, "A", "2024-01-20 00:00:00", 20.00),
            (3, "B", "2024-02-05 00:00:00", 5.25),
            (4, "A", "2024-02-06 00:00:00", None),
        ]),
        "order_id bigint, status string, at timestamp, amount double",
    )


def test_metric_sum_by_month_and_dim(model):
    m = Metric("rev", "sum", "amount", "at", dims=("status",))
    got = {
        (str(r["month"])[:10], r.status): r.rev
        for r in query_metric(model, m, "month", ["status"]).collect()
    }
    assert got[("2024-01-01", "A")] == 30.50
    assert got[("2024-02-01", "B")] == 5.25
    assert got[("2024-02-01", "A")] is None  # sum of only-NULL group


def test_metric_avg_is_decimal_exact(model):
    m = Metric("aov", "avg", "amount", "at")
    got = {str(r["month"])[:10]: r.aov
           for r in query_metric(model, m, "month").collect()}
    assert got["2024-01-01"] == 30.50 / 2  # (10.50+20.00)/2 exactly
    assert got["2024-02-01"] == 5.25  # NULL excluded from count(e)


def test_metric_count_distinct(model):
    m = Metric("buyers", "count_distinct", "status", "at")
    got = {str(r["month"])[:10]: r.buyers
           for r in query_metric(model, m, "month").collect()}
    assert got == {"2024-01-01": 1, "2024-02-01": 2}


def test_metric_undeclared_dim_raises(model):
    m = Metric("rev", "sum", "amount", "at", dims=("status",))
    with pytest.raises(ValueError, match="does not declare"):
        query_metric(model, m, "month", ["order_id"])


def test_metric_unknown_grain_and_agg_raise(model):
    with pytest.raises(ValueError, match="unknown grain"):
        query_metric(model, Metric("r", "sum", "amount", "at"), "hour")
    with pytest.raises(ValueError, match="unknown agg"):
        query_metric(model, Metric("r", "median", "amount", "at"), "month") \
            .collect()


def test_metric_single_exchange_plan(model):
    """One hash aggregate with map-side partials — no extra shuffle."""
    m = Metric("rev", "sum", "amount", "at", dims=("status",))
    plan = (
        query_metric(model, m, "month", ["status"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1


# -------------------------------------------------------- monitoring
def _series(spark, vals):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "t bigint, v bigint"
    )


def test_anomaly_flags_planted_spike(spark):
    from olist_snowflake_dbt_spark.operators.monitoring import metric_anomalies

    vals = [100] * 10 + [1000] + [100] * 5  # flat baseline, one spike
    out = metric_anomalies(_series(spark, vals), "t", "v", baseline=5, k=3)
    got = {r.t: r.is_anomaly for r in out.collect()}
    assert got[10] is True  # the spike
    assert got[9] is False and got[11] is False
    assert all(got[t] is None for t in range(5))  # warmup: no verdict


def test_anomaly_flat_baseline_sigma_zero_edge(spark):
    """sigma=0: ANY deviation is anomalous, equality is not —
    (n*x-S)^2 > 0 exactly."""
    from olist_snowflake_dbt_spark.operators.monitoring import metric_anomalies

    vals = [7] * 8 + [8] + [7] * 2
    out = metric_anomalies(_series(spark, vals), "t", "v", baseline=5, k=3)
    got = {r.t: r.is_anomaly for r in out.collect()}
    assert got[8] is True  # 7->8 under zero variance
    assert got[7] is False  # equal to flat baseline


def test_anomaly_matches_float_zscore(spark):
    """The exact integer test must agree with the float z-score
    formulation away from boundaries (population sigma over the
    trailing window)."""
    import statistics

    from olist_snowflake_dbt_spark.operators.monitoring import metric_anomalies

    vals = [103, 98, 105, 110, 91, 99, 104, 250, 97, 101, 95, 400, 102]
    out = metric_anomalies(_series(spark, vals), "t", "v", baseline=5, k=3)
    got = {r.t: r.is_anomaly for r in out.collect()}
    for t in range(5, len(vals)):
        window = vals[t - 5:t]
        mu = statistics.mean(window)
        var = statistics.pvariance(window)
        expect = (vals[t] - mu) ** 2 > 9 * var
        assert got[t] == expect, f"t={t}"


def test_anomaly_large_values_stay_exact(spark):
    """Cents-scale values near 1e12 (100 TB-era daily revenue) must not
    overflow or round: decimal(38) holds (n*x-S)^2 ~ 1e26 exactly."""
    from olist_snowflake_dbt_spark.operators.monitoring import metric_anomalies

    big = 10**12
    vals = [big, big, big, big + 1]  # +1 deviation under sigma=0
    out = metric_anomalies(_series(spark, vals), "t", "v", baseline=3, k=3)
    got = {r.t: r.is_anomaly for r in out.collect()}
    assert got[3] is True


def test_anomaly_wide_params_no_silent_null(spark):
    """baseline >= 100 / k >= 10 previously overflowed a decimal(2,0)
    cast to NULL with ANSI off, silencing every verdict; the widened
    decimal(4,0) path must emit real booleans, and out-of-range
    parameters must raise instead of NULLing downstream."""
    import pytest

    from olist_snowflake_dbt_spark.operators.monitoring import metric_anomalies

    vals = [100] * 120 + [10000] + [100] * 3
    out = metric_anomalies(_series(spark, vals), "t", "v", baseline=100, k=10)
    got = {r.t: r.is_anomaly for r in out.collect()}
    assert got[120] is True  # the spike — NOT silently NULL
    assert got[119] is False and got[121] is False

    with pytest.raises(ValueError, match="baseline"):
        metric_anomalies(_series(spark, [1]), "t", "v", baseline=10000)
    with pytest.raises(ValueError, match="k must"):
        metric_anomalies(_series(spark, [1]), "t", "v", k=100)



# ------------------------------------------------------- skew advisor
def test_key_skew_stats_exact_numbers(spark):
    from olist_snowflake_dbt_spark.operators.skew import key_skew_stats

    # 80 rows of key 'hot', 10 keys x 2 rows
    rows = [("hot",)] * 80 + [(f"k{i}",) for i in range(10) for _ in range(2)]
    df = spark.createDataFrame(rows, "k string")
    out = {r.k: r for r in key_skew_stats(df, ["k"], top=3).collect()}
    hot = out["hot"]
    assert (hot.key_rows, hot.total_rows, hot.distinct_keys) == (80, 100, 11)
    assert hot.share_per_mille == 800
    assert hot.hotness_ratio == 80 * 11 // 100  # 8
    assert hot.recommended_salts == 8
    cold = [r for k, r in out.items() if k != "hot"][0]
    assert cold.key_rows == 2 and cold.recommended_salts == 1  # floored


def test_key_skew_stats_uniform_key_recommends_no_salt(spark):
    from olist_snowflake_dbt_spark.operators.skew import key_skew_stats

    df = spark.createDataFrame([(i % 10,) for i in range(100)], "k bigint")
    out = key_skew_stats(df, ["k"], top=10).collect()
    assert all(r.recommended_salts == 1 for r in out)


def test_key_skew_stats_matches_salted_join_contract(spark):
    """The advisor's recommendation actually balances the hot key: with
    recommended_salts salts, the hot key's per-salt row count falls to
    ~the average key's count."""
    from olist_snowflake_dbt_spark.operators.skew import key_skew_stats

    rows = [("hot", 1)] * 90 + [(f"k{i}", 1) for i in range(9)]
    df = spark.createDataFrame(rows, "k string, v long")
    [hot] = [r for r in key_skew_stats(df, ["k"], top=1).collect()]
    per_salt = hot.key_rows / hot.recommended_salts
    avg = hot.total_rows / hot.distinct_keys
    assert per_salt <= 2 * avg
