"""Metric anomaly monitoring: rolling-baseline outlier detection.

The dbt-observability layer (elementary / re_data / Monte-Carlo-style
monitors) watches a METRIC SERIES — one row per (grain bucket), already
aggregated by the warehouse — and flags buckets whose value deviates
from a trailing baseline by more than k sigma. This module is that
monitor for metric frames produced by ``plans/metrics.query_metric``
(or any (bucket, value) series).

Exactness: the k-sigma test is evaluated WITHOUT floating point. With
integer metric values x (e.g. cents), trailing-window count n, sum S
and sum-of-squares SS, the test

    (x - mean)^2 > k^2 * variance
    <=>  (n*x - S)^2 > k^2 * (n*SS - S^2)

is pure integer arithmetic — evaluated in DECIMAL(38,0) so a DuckDB
oracle reproduces every verdict bit-for-bit, including the σ=0 edge
(flat baseline: any deviation is anomalous, equality is not).

Scale: the input is the aggregated series (one row per bucket — days of
years are thousands of rows), so the ordered window runs in ONE task by
construction; the expensive part of monitoring at 100 TB is producing
the series, which is the metric layer's single map-side-combinable
aggregate. The window is declared with an explicit constant partition
to make the single-partition intent visible to the planner and reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def metric_anomalies(
    series: DataFrame,
    time_col: str,
    value_col: str,
    baseline: int = 14,
    k: int = 3,
) -> DataFrame:
    """Flag buckets whose integer metric value deviates more than ``k``
    sigma from the trailing ``baseline`` buckets (current excluded).
    Buckets with fewer than ``baseline`` predecessors emit
    ``is_anomaly = NULL`` (no verdict) rather than a false negative.

    Returns the series plus (baseline_n, baseline_sum, is_anomaly).

    ``baseline`` and ``k`` are validated eagerly: the exact-integer
    comparison routes ``n`` and ``k*k`` through bounded DECIMALs, and
    with ANSI off an overflowing CAST yields NULL — which would turn
    every verdict into a silent ``is_anomaly = NULL`` instead of an
    error. decimal(4,0) covers n ≤ 9999 and k ≤ 99; anything beyond
    that raises here rather than NULLing downstream.
    """
    if not (1 <= baseline <= 9999):
        raise ValueError(f"baseline must be in [1, 9999], got {baseline}")
    if not (1 <= k <= 99):
        raise ValueError(f"k must be in [1, 99], got {k}")
    w = (
        W.partitionBy(F.lit(0))
        .orderBy(time_col)
        .rowsBetween(-baseline, -1)
    )
    x = F.col(value_col)
    n = F.count(x).over(w).cast("bigint")
    s = F.sum(x.cast("decimal(19,0)")).over(w).cast("decimal(19,0)")
    ss = F.sum(
        x.cast("decimal(18,0)") * x.cast("decimal(18,0)")
    ).over(w).cast("decimal(36,0)")
    lhs = (
        (n.cast("decimal(19,0)") * x.cast("decimal(19,0)")).cast("decimal(19,0)")
        - s
    ).cast("decimal(19,0)")
    lhs2 = lhs * lhs  # decimal(38,0), exact
    rhs = F.lit(k * k).cast("decimal(4,0)") * (
        (n.cast("decimal(4,0)") * ss).cast("decimal(38,0)")
        - (s * s).cast("decimal(38,0)")
    ).cast("decimal(38,0)")
    return series.select(
        "*",
        n.alias("baseline_n"),
        s.cast("decimal(38,0)").alias("baseline_sum"),
        F.when(n == baseline, lhs2 > rhs).alias("is_anomaly"),
    )
