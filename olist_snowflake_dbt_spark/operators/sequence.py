"""Ordered-sequence analytics: Markov transition matrices and
dialogue-shape validation.

Two workloads share this module's shape — classic user-journey
analytics (what follows what in an event stream; the reference's domain
is e-commerce funnels over exactly such an events table) and SFT/chat
training-data validation (are conversations well-formed: roles
alternate, sessions open with the user, turn counts are sane) — because
both are ONE ordered window per partition key followed by ONE
aggregate.

Scale design: the only exchange is the hash partition on the sequence
key (user/session); the window sort is per-key and keys are numerous
and small (bounded events per user per horizon), so there is no skew
cliff and no global sort. Everything downstream of the lag() is
codegen'd expression work; transition counting is a map-side-combinable
count aggregate on (src, dst) — at 100 TB the transition matrix that
leaves the shuffle is |states|² rows regardless of corpus size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def transition_matrix(
    df: DataFrame,
    key_col: str,
    order_cols: Sequence[str],
    state_col: str,
    prob_decimals: int = 9,
) -> DataFrame:
    """First-order Markov transition matrix over per-key ordered
    sequences: for every adjacent (state, next-state) pair within a
    key's sequence, the transition count and row-normalized
    probability.

    Returns ``(src_state, dst_state, n_trans, prob)`` where ``prob`` is
    ``n_trans / SUM(n_trans) OVER src_state`` rounded to
    ``prob_decimals`` (the division is the single double step, computed
    from exact integer counts — engine-portable). The last event of
    each key has no successor and contributes no transition.

    Plan: one exchange on ``key_col`` for the lead() window, one
    map-side-combinable count on (src, dst), one broadcast-sized window
    over the ≤|states|² matrix for the row normalizer.
    """
    w = W.partitionBy(key_col).orderBy(*order_cols)
    pairs = (
        df.select(
            F.col(state_col).alias("src_state"),
            F.lead(state_col).over(w).alias("dst_state"),
        )
        .filter(F.col("dst_state").isNotNull())
    )
    counts = pairs.groupBy("src_state", "dst_state").agg(
        F.count(F.lit(1)).alias("n_trans")
    )
    row_tot = W.partitionBy("src_state")
    return counts.select(
        "src_state",
        "dst_state",
        "n_trans",
        F.round(
            F.col("n_trans").cast("double")
            / F.sum("n_trans").over(row_tot).cast("double"),
            prob_decimals,
        ).alias("prob"),
    )


def dialogue_turn_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    role_col: str,
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session dialogue-shape statistics — the validation pass an
    SFT/chat corpus runs before training: sessionize each key's event
    sequence by inactivity gap, then per session report message count,
    turn count (maximal same-role runs), whether the session opens with
    the ``'user'`` role, whether roles STRICTLY alternate, and the
    session duration in exact microseconds.

    Returns ``(key, session_no, n_msgs, n_turns, starts_with_user,
    strict_alternation, duration_us)``; ``session_no`` is 1-based per
    key in time order. Ordering inside a key is ``(ts, all columns
    deterministic via ts)`` — pass a tie-broken ``ts_col`` upstream or
    accept timestamp ties as unordered.

    Plan: ONE exchange on ``key_col``; the session boundary (gap >
    ``gap_minutes``), the session number (running sum of boundaries),
    and the turn flag (role != previous role) are three expressions
    over the same window sort; the per-session aggregate is map-side
    combinable.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    renamed = df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(role_col).alias("role"),
    )
    w = W.partitionBy("key").orderBy("ts")
    marked = renamed.select(
        "key",
        "ts",
        "role",
        F.when(
            F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(F.lag("ts").over(w).cast("timestamp")) > gap_us,
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_session"),
        F.when(F.lag("role").over(w).isNull(), F.lit(1))
        .when(F.lag("role").over(w) != F.col("role"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("role_change"),
    )
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    sess = marked.withColumn(
        "session_no",
        (F.sum("new_session").over(run) + F.lit(1)).cast("int"),
    )
    # role_change was computed against the key-wide previous row; the
    # first row of a NEW session always starts a turn regardless of the
    # role that closed the previous session.
    sess = sess.withColumn(
        "turn_start",
        F.when(F.col("new_session") == 1, F.lit(1)).otherwise(
            F.col("role_change")
        ),
    )
    return sess.groupBy("key", "session_no").agg(
        F.count(F.lit(1)).alias("n_msgs"),
        F.sum("turn_start").cast("int").alias("n_turns"),
        (F.min_by("role", "ts") == F.lit("user")).alias("starts_with_user"),
        (F.sum("turn_start") == F.count(F.lit(1))).alias(
            "strict_alternation"
        ),
        (F.max(F.unix_micros(F.col("ts").cast("timestamp"))) - F.min(F.unix_micros(F.col("ts").cast("timestamp")))).alias(
            "duration_us"
        ),
    )


def cohort_retention(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    granularity: str = "month",
) -> DataFrame:
    """Cohort-retention matrix — the classic growth-analytics
    triangle: users cohorted by the period (``month`` or ``day``) of
    their FIRST event; for every (cohort period, period offset) cell,
    how many distinct cohort members were active, and the retention
    share.

    Returns ``(cohort_period, period_offset, n_active, n_cohort,
    retention_ppm)`` with ``retention_ppm = n_active · 1_000_000 DIV
    n_cohort`` (integer-exact parts-per-million; offset 0 is the cohort
    period itself, so its ppm is 1_000_000 by construction). Periods
    compare as plain integers (``year·12 + month`` / days since epoch)
    — no calendar arithmetic to disagree on; ``cohort_period`` is
    rendered ``yyyy-MM-dd`` (first day of the period).

    Plan: one aggregate keyed on ``key_col`` finds each key's first
    period fused with its distinct active periods (collect_set bounded
    by the horizon); the explode + (cohort, offset) count is a second
    map-side-combinable aggregate. The matrix leaving the final
    exchange is O(horizon²) cells at any corpus size.
    """
    if granularity == "month":
        pnum = F.year(ts_col) * 12 + F.month(ts_col)
        render = F.date_format(
            F.make_date(
                ((F.col("cohort_p") - 1) / 12).cast("int"),
                ((F.col("cohort_p") - 1) % 12 + 1).cast("int"),
                F.lit(1),
            ),
            "yyyy-MM-dd",
        )
    elif granularity == "day":
        pnum = F.datediff(F.to_date(ts_col), F.to_date(F.lit("1970-01-01")))
        render = F.date_format(
            F.date_add(F.to_date(F.lit("1970-01-01")), F.col("cohort_p")),
            "yyyy-MM-dd",
        )
    else:
        raise ValueError(
            f"granularity must be 'month' or 'day' (got {granularity!r})"
        )
    per_key = df.groupBy(key_col).agg(
        F.min(pnum).alias("cohort_p"),
        F.collect_set(pnum).alias("active_ps"),
    )
    cells = per_key.select(
        "cohort_p",
        F.explode("active_ps").alias("active_p"),
    ).groupBy("cohort_p", "active_p").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    cohort_sizes = per_key.groupBy("cohort_p").agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    return (
        cells.join(F.broadcast(cohort_sizes), "cohort_p")
        .select(
            render.alias("cohort_period"),
            (F.col("active_p") - F.col("cohort_p")).alias("period_offset"),
            "n_active",
            "n_cohort",
            F.expr("n_active * 1000000 DIV n_cohort").alias("retention_ppm"),
        )
    )
