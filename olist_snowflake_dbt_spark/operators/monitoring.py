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


def _check_output_collisions(df: DataFrame, out_cols: tuple) -> None:
    """Raise when appended output column names already exist on the
    input — a silent duplicate/ambiguous column otherwise (same
    contract as the ``__``-prefixed temporaries elsewhere in the repo:
    operators never shadow caller columns)."""
    clash = [c for c in out_cols if c in df.columns]
    if clash:
        raise ValueError(
            f"input already has column(s) {clash}; rename them before "
            f"calling (operator appends {list(out_cols)})"
        )


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


def drift_chi2(
    ref: DataFrame,
    cur: DataFrame,
    feature_col: str,
) -> DataFrame:
    """Categorical distribution-drift monitor: per-category chi-square
    contributions of the CURRENT window against the REFERENCE window —
    the standard data-drift gate a feature store / training pipeline
    runs before trusting a new batch (same statistic scikit-learn /
    Evidently-style monitors report; PSI's log-free sibling).

    For category c with reference count ``r_c`` (n_ref total) and
    current count ``o_c`` (n_cur total), the expected current count
    under no-drift is ``e_c = n_cur · (r_c + 1) / (n_ref + K)`` —
    add-one smoothing over the K categories of the UNION, so a category
    unseen in the reference contributes a finite, well-defined term
    instead of dividing by zero. The contribution is the classic
    ``(o_c - e_c)² / e_c``.

    Determinism: every input is an exact integer; the contribution is
    evaluated in double space with one fixed expression tree
    (correctly-rounded mul/div on values < 2^53) and quantized to
    ``floor(x * 1e6)`` micros, so the drift table — and any alert
    threshold on its sum — is bit-identical across engines.

    Returns one row per category: ``(feature value, n_ref, n_cur,
    expected_micro, chi2_contrib_micro)``; Σ contrib over rows is the
    chi-square statistic (df = K - 1) to threshold on.

    Scale: two map-side-combinable counts + a full-outer join on the
    category key + two broadcast scalars — cost is O(distinct
    categories), never the table."""
    rc = ref.groupBy(F.col(feature_col).alias("f")).agg(
        F.count(F.lit(1)).alias("n_ref")
    )
    cc = cur.groupBy(F.col(feature_col).alias("f")).agg(
        F.count(F.lit(1)).alias("n_cur")
    )
    cats = rc.join(cc, "f", "full_outer").select(
        "f",
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
    )
    totals = cats.agg(
        F.sum("n_ref").alias("__nr"),
        F.sum("n_cur").alias("__nc"),
        F.count(F.lit(1)).alias("__k"),
    )  # 1 row — broadcast
    j = cats.join(F.broadcast(totals))
    e = (
        F.col("__nc").cast("double")
        * (F.col("n_ref") + F.lit(1))
        / (F.col("__nr") + F.col("__k"))
    )
    diff = F.col("n_cur").cast("double") - e
    return j.select(
        F.col("f").alias(feature_col),
        "n_ref",
        "n_cur",
        F.floor(e * F.lit(1_000_000.0)).alias("expected_micro"),
        F.floor(diff * diff / e * F.lit(1_000_000.0)).alias("chi2_contrib_micro"),
    )


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 3.0,
    consistency: float = 1.4826,
) -> DataFrame:
    """Median-absolute-deviation outlier flags per group — the robust
    alternative to k-sigma (``metric_anomalies``) when the metric
    itself is heavy-tailed: a single wild value inflates a standard
    deviation enough to hide itself, but moves the median and the MAD
    almost nothing (50% breakdown point vs 0%).

    Flags row ``x`` when ``|x − median| > k · consistency · MAD`` with
    ``MAD = median(|x − median|)``; ``consistency = 1.4826`` rescales
    MAD to estimate σ under normality (Hampel's constant), so ``k``
    reads in the familiar sigma units. Appends ``med``, ``mad`` and
    ``is_outlier``; both medians are exact ``percentile(0.5)``
    (interpolating) — the one non-integer step, the same single
    expression on any engine.

    Plan: two grouped exact-percentile aggregates (group cardinality
    rows each) broadcast back onto the stream — the row-level pass
    never shuffles. At 100 TB swap ``percentile`` for
    ``approx_percentile`` if exactness is not contractual (same trade
    as percentile_agg); groups are metric names — small and bounded.
    """
    if k <= 0:
        raise ValueError(f"k must be positive (got {k})")
    _check_output_collisions(df, ("med", "mad", "is_outlier"))
    med = df.groupBy(group_col).agg(
        F.expr(f"percentile(CAST(`{value_col}` AS DOUBLE), 0.5)").alias(
            "med"
        )
    )
    with_med = df.join(F.broadcast(med), group_col)
    mad = (
        with_med.groupBy(group_col)
        .agg(
            F.expr(
                f"percentile(abs(CAST(`{value_col}` AS DOUBLE) - med), 0.5)"
            ).alias("mad")
        )
    )
    return (
        with_med.join(F.broadcast(mad), group_col)
        .withColumn(
            "is_outlier",
            F.abs(F.col(value_col).cast("double") - F.col("med"))
            > F.lit(k) * F.lit(consistency) * F.col("mad"),
        )
    )


def ab_test_ztest(
    df: DataFrame,
    variant_col: str,
    converted_col: str,
    variant_a,
    variant_b,
    z_crit: float = 1.96,
) -> DataFrame:
    """Two-proportion z-test for an A/B experiment — the ship/no-ship
    readout: per-variant exposure and conversion counts, integer-exact
    ppm conversion rates, the pooled z statistic, and the two-sided
    5%-level verdict.

    ``converted_col`` is a boolean (unit converted?); rows whose
    variant is neither ``variant_a`` nor ``variant_b`` are ignored
    (multi-arm experiments test pairwise). Counts aggregate exactly;
    ``z = (p̂₁−p̂₂) / √(p̂(1−p̂)(1/n₁+1/n₂))`` with the pooled p̂ is the
    single double expression, computed from exact integers in one
    fixed order (engine-portable), rounded to 9. Degenerate edges —
    zero variance (pooled rate 0 or 1) OR an EMPTY arm (a variant with
    no rows: misconfigured assignment, a filter that ate one arm) —
    yield NULL rate/z columns and a false verdict rather than a
    division blow-up (the empty-arm case would otherwise divide by
    zero, which raises under ANSI mode).

    Plan: ONE map-side-combinable conditional aggregate — a single row
    through the exchange at any experiment size.
    """
    is_a = F.col(variant_col) == F.lit(variant_a)
    is_b = F.col(variant_col) == F.lit(variant_b)
    conv = F.col(converted_col).cast("boolean")
    agg = df.agg(
        F.sum(is_a.cast("long")).alias("n_a"),
        F.sum((is_a & conv).cast("long")).alias("conv_a"),
        F.sum(is_b.cast("long")).alias("n_b"),
        F.sum((is_b & conv).cast("long")).alias("conv_b"),
    )
    both_arms = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    pa = F.col("conv_a").cast("double") / F.col("n_a").cast("double")
    pb = F.col("conv_b").cast("double") / F.col("n_b").cast("double")
    pooled = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    se = F.sqrt(
        pooled
        * (F.lit(1.0) - pooled)
        * (
            F.lit(1.0) / F.col("n_a").cast("double")
            + F.lit(1.0) / F.col("n_b").cast("double")
        )
    )
    z = F.when(both_arms & (se > 0), F.round((pa - pb) / se, 9))
    return agg.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.when(
            F.col("n_a") > 0, F.expr("conv_a * 1000000 DIV n_a")
        ).alias("cr_a_ppm"),
        F.when(
            F.col("n_b") > 0, F.expr("conv_b * 1000000 DIV n_b")
        ).alias("cr_b_ppm"),
        z.alias("z_stat"),
        F.coalesce(F.abs(z) > F.lit(z_crit), F.lit(False)).alias(
            "significant"
        ),
    )


def winsorize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo_pct: float = 0.01,
    hi_pct: float = 0.99,
) -> DataFrame:
    """Winsorization per group: clip values to the [lo_pct, hi_pct]
    exact percentile band — the tail-taming transform for metrics
    where :func:`mad_outliers` would DROP rows but the pipeline must
    keep them (revenue aggregates, training-feature scaling: deletion
    biases, clipping bounds).

    Appends ``lo_bound``, ``hi_bound`` and ``clipped`` (LEAST/GREATEST
    of the value and the bounds — NULL values stay NULL). The exact
    interpolating percentile is the single non-integer step, the same
    expression on any engine.

    Plan: one grouped percentile aggregate (group-cardinality rows)
    broadcast back onto the stream — the row-level pass never
    shuffles; the same shape and the same 100-TB note as
    mad_outliers (swap in approx_percentile when exactness is not
    contractual).
    """
    if not 0 <= lo_pct < hi_pct <= 1:
        raise ValueError(
            f"need 0 <= lo_pct < hi_pct <= 1 (got {lo_pct}, {hi_pct})"
        )
    _check_output_collisions(df, ("lo_bound", "hi_bound", "clipped"))
    bounds = df.groupBy(group_col).agg(
        F.expr(
            f"percentile(CAST(`{value_col}` AS DOUBLE), {lo_pct!r})"
        ).alias("lo_bound"),
        F.expr(
            f"percentile(CAST(`{value_col}` AS DOUBLE), {hi_pct!r})"
        ).alias("hi_bound"),
    )
    # LEAST/GREATEST skip NULLs on both engines (a NULL value would
    # silently clip to lo_bound) — preserve NULL explicitly.
    clipped = F.when(
        F.col(value_col).isNull(), F.lit(None).cast("double")
    ).otherwise(
        F.least(
            F.greatest(F.col(value_col).cast("double"), F.col("lo_bound")),
            F.col("hi_bound"),
        )
    )
    return df.join(F.broadcast(bounds), group_col).withColumn(
        "clipped", clipped
    )


def cusum_changepoint(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """CUSUM changepoint estimate per series — where did the level
    shift? The classic statistic ``argmax_t |CUSUM_t|`` with
    ``CUSUM_t = Σ_{i≤t}(x_i − x̄)``, evaluated in EXACT integer
    arithmetic: multiplying through by n turns it into
    ``|n·cum_t − t·total|`` (integers only — the mean never needs to
    be materialized as a float, so no engine can disagree at the ulp).

    Returns one row per key: ``(key, t_star, cusum_max_scaled, n)``
    where ``t_star`` is the ORDER value at the maximizing prefix
    (earliest wins ties — deterministic) and ``cusum_max_scaled`` is
    the n-scaled statistic (divide by n for the classical units;
    callers threshold against a permutation or Hinkley bound).
    Values must be integers (counts; scale decimals upstream).

    Plan: ONE window pass per key (running sum + row number off the
    same sort) and one min_by aggregate — one key exchange; state per
    row is O(1). The monitoring sibling of metric_anomalies (level
    shift vs point anomaly).
    """
    renamed = df.select(
        F.col(key_col).alias("key"),
        F.col(order_col).alias("t"),
        F.col(value_col).cast("long").alias("x"),
    )
    ordered = W.partitionBy("key").orderBy("t")
    run = ordered.rowsBetween(W.unboundedPreceding, W.currentRow)
    whole = W.partitionBy("key")
    marked = renamed.select(
        "key",
        "t",
        F.sum("x").over(run).alias("cum"),
        F.row_number().over(ordered).alias("rn"),
        F.sum("x").over(whole).alias("total"),
        F.count(F.lit(1)).over(whole).alias("n"),
    )
    stat = marked.withColumn(
        "s", F.abs(F.col("n") * F.col("cum") - F.col("rn") * F.col("total"))
    )
    # earliest-t tiebreak: pack (−s, t) so min_by is (max s, min t)
    return stat.groupBy("key").agg(
        F.min_by(
            F.struct(F.col("t").alias("t_star"), F.col("s")),
            F.struct((-F.col("s")).alias("neg"), F.col("t")),
        ).alias("__w"),
        F.first("n").alias("n"),
    ).select(
        F.col("key"),
        F.col("__w.t_star").alias("t_star"),
        F.col("__w.s").cast("long").alias("cusum_max_scaled"),
        F.col("n").cast("long").alias("n"),
    )


def ks_two_sample(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    alpha_c: float = 1.3581,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift monitor for a NUMERIC
    column — the continuous-distribution sibling of :func:`drift_chi2`
    (chi-square needs categories; KS compares whole empirical CDFs and
    is the standard gate for "did this feature's distribution move"
    between a reference window and the current batch).

    The statistic is exact integer arithmetic end to end: at every
    distinct observed value x, the scaled CDF gap is ``|cnt_ref≤x · n_cur
    − cnt_cur≤x · n_ref|`` (both CDFs put over the common denominator
    ``n_ref·n_cur``), and D_scaled = max over x — no floats until the
    final presentation division ``ks_micro = (1e6·D_scaled) div
    (n_ref·n_cur)``. int64 bounds: per-window sample counts ≤ ~3e6 keep
    ``1e6·D_scaled`` under 9e18 (monitoring windows are day/batch
    slices; subsample beyond that, the statistic's power saturates
    anyway).

    The decision threshold is the classic large-sample critical value
    ``c(α)·sqrt((n_ref+n_cur)/(n_ref·n_cur))`` (``alpha_c`` = 1.3581 is
    c at α = 0.05): computed in ONE fixed double expression tree —
    int64→double conversions are exact, divide/sqrt/multiply are
    IEEE-correctly-rounded — then floored to micros, so both the
    statistic and the reject flag are bit-identical across engines.

    NULL values carry no order information, so they are EXCLUDED from
    both samples before counting (they are not observations of the
    metric; without the filter a NULL key would survive the groupBy
    but never match in the full-outer join, double-counting into
    n_ref/n_cur and entering the CDF at nulls-first order). n_ref and
    n_cur therefore count non-NULL observations only.

    Scale: two map-side-combinable per-value counts → a full-outer
    join on value → ONE window over the DISTINCT-VALUE frame (ordered
    cumulative sums — the frame is bounded by the metric's value
    cardinality, never the event volume; quantize a truly continuous
    metric first). Returns one row: ``(n_ref, n_cur, d_scaled,
    ks_micro, crit_micro, reject)``."""
    rc = (
        ref.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).alias("v"))
        .agg(F.count(F.lit(1)).alias("__cr"))
    )
    cc = (
        cur.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).alias("v"))
        .agg(F.count(F.lit(1)).alias("__cc"))
    )
    vals = rc.join(cc, "v", "full_outer").select(
        "v",
        F.coalesce("__cr", F.lit(0)).alias("__cr"),
        F.coalesce("__cc", F.lit(0)).alias("__cc"),
    )
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    cum = vals.select(
        F.sum("__cr").over(w).alias("__ar"),
        F.sum("__cc").over(w).alias("__ac"),
    )
    tot = vals.agg(
        F.sum("__cr").alias("n_ref"), F.sum("__cc").alias("n_cur")
    )
    d = (
        cum.crossJoin(F.broadcast(tot))
        .select(
            F.abs(
                F.col("__ar") * F.col("n_cur") - F.col("__ac") * F.col("n_ref")
            ).alias("__gap"),
            "n_ref",
            "n_cur",
        )
        .groupBy("n_ref", "n_cur")
        .agg(F.max("__gap").alias("d_scaled"))
    )
    nn = F.col("n_ref") * F.col("n_cur")
    crit = F.floor(
        F.lit(alpha_c)
        * F.sqrt(
            (F.col("n_ref") + F.col("n_cur")).cast("double") / nn.cast("double")
        )
        * F.lit(1_000_000.0)
    ).cast("long")
    return d.select(
        "n_ref",
        "n_cur",
        "d_scaled",
        F.expr("(1000000 * d_scaled) div (n_ref * n_cur)").alias("ks_micro"),
        crit.alias("crit_micro"),
        (
            F.expr("(1000000 * d_scaled) div (n_ref * n_cur)") > crit
        ).alias("reject"),
    )
