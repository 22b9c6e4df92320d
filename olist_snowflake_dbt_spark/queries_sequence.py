"""Driver queries for ordered-sequence analytics: window navigation
with IGNORE NULLS, Markov transition matrices, and dialogue-shape
validation (the SFT/chat corpus pre-training checks).

Determinism: event ordering ties are broken by ``event_id`` wherever
the semantics depend on order; the one division (transition
probability) is a single double step from exact integer counts, rounded
identically on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.sequence import dialogue_turn_stats, transition_matrix
from .queries import _t, query

_NAV_ORACLE = """
SELECT event_id, user_id,
       lag(purchase_val IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_purchase,
       lead(purchase_val IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_purchase,
       nth_value(purchase_val, 2 IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS second_purchase
FROM (SELECT event_id, user_id, ts,
             CASE WHEN event_type = 'purchase' THEN value END AS purchase_val
      FROM events)
"""


@query("window_nav_ignore_nulls", _NAV_ORACLE)
def q_window_nav_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window navigation with IGNORE NULLS — Snowflake/ANSI parity for
    LAG / LEAD / NTH_VALUE over a NULL-sparse measure (the
    carry-forward-the-last-purchase shape). Spark spells it the ANSI
    way (``lag(x) IGNORE NULLS OVER ...``); the whole query is one
    window sort per user partition, no Python anywhere. Values pass
    through unchanged (no arithmetic), so doubles are bit-identical
    across engines."""
    ev = _t(spark, sf_dir, "events").selectExpr(
        "event_id",
        "user_id",
        "ts",
        "CASE WHEN event_type = 'purchase' THEN value END AS purchase_val",
    )
    ev.createOrReplaceTempView("__nav_events")
    return spark.sql(
        """
        SELECT event_id, user_id,
               lag(purchase_val) IGNORE NULLS
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_purchase,
               lead(purchase_val) IGNORE NULLS
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS next_purchase,
               nth_value(purchase_val, 2) IGNORE NULLS
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND UNBOUNDED FOLLOWING) AS second_purchase
        FROM __nav_events
        """
    )


_MARKOV_ORACLE = """
WITH pairs AS (
    SELECT event_type AS src_state,
           lead(event_type)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst_state
    FROM events
),
counts AS (
    SELECT src_state, dst_state, COUNT(*) AS n_trans
    FROM pairs WHERE dst_state IS NOT NULL
    GROUP BY src_state, dst_state
)
SELECT src_state, dst_state, n_trans,
       ROUND(CAST(n_trans AS DOUBLE)
             / CAST(SUM(n_trans) OVER (PARTITION BY src_state) AS DOUBLE),
             9) AS prob
FROM counts
"""


@query("markov_transitions", _MARKOV_ORACLE)
def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences (operators/sequence.transition_matrix) — the user-journey
    \"what follows what\" analysis run on exactly this events-table
    shape. One exchange for the per-user lead() window, one map-side-
    combinable count; the matrix leaving the shuffle is |states|² rows
    at any corpus size."""
    ev = _t(spark, sf_dir, "events")
    return transition_matrix(
        ev, key_col="user_id", order_cols=["ts", "event_id"],
        state_col="event_type",
    )


_CHAT_ORACLE = """
WITH renamed AS (
    SELECT user_id AS key, ts,
           CASE WHEN event_type IN ('click', 'view')
                THEN 'user' ELSE 'assistant' END AS role
    FROM events
),
marked AS (
    SELECT key, ts, role,
           CASE WHEN epoch_us(ts) - epoch_us(lag(ts)
                    OVER (PARTITION BY key ORDER BY ts)) > 1800000000
                THEN 1 ELSE 0 END AS new_session,
           CASE WHEN lag(role) OVER (PARTITION BY key ORDER BY ts)
                     IS DISTINCT FROM role
                THEN 1 ELSE 0 END AS role_change
    FROM renamed
),
sess AS (
    SELECT key, ts, role,
           CAST(1 + SUM(new_session) OVER (
               PARTITION BY key ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT)
               AS session_no,
           CASE WHEN new_session = 1 THEN 1 ELSE role_change END AS turn_start
    FROM marked
)
SELECT key, session_no,
       COUNT(*) AS n_msgs,
       CAST(SUM(turn_start) AS INT) AS n_turns,
       min_by(role, ts) = 'user' AS starts_with_user,
       SUM(turn_start) = COUNT(*) AS strict_alternation,
       MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS duration_us
FROM sess GROUP BY key, session_no
"""


@query("chat_turn_stats", _CHAT_ORACLE)
def q_chat_turn_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dialogue-shape validation (operators/sequence.
    dialogue_turn_stats): sessionize each user's events by a 30-minute
    inactivity gap, then per session report message count, turn count
    (maximal same-role runs), whether the session opens with the user
    role, strict-alternation, and exact-microsecond duration — the
    well-formedness pass an SFT corpus runs before training. Roles here
    derive from event_type (click/view = user) purely to exercise the
    operator on the given tables."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        F.when(F.col("event_type").isin("click", "view"), F.lit("user"))
        .otherwise(F.lit("assistant"))
        .alias("role"),
    )
    return dialogue_turn_stats(
        ev, key_col="user_id", ts_col="ts", role_col="role", gap_minutes=30
    )


_COHORT_ORACLE = """
WITH dn AS (
    SELECT user_id,
           date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS p
    FROM events
),
per_key AS (
    SELECT user_id, MIN(p) AS cohort_p FROM dn GROUP BY user_id
),
active AS (
    SELECT DISTINCT dn.user_id, k.cohort_p, dn.p AS active_p
    FROM dn JOIN per_key k ON dn.user_id = k.user_id
),
cells AS (
    SELECT cohort_p, active_p, COUNT(*) AS n_active
    FROM active GROUP BY cohort_p, active_p
),
sizes AS (
    SELECT cohort_p, COUNT(*) AS n_cohort FROM per_key GROUP BY cohort_p
)
SELECT strftime(DATE '1970-01-01' + INTERVAL (c.cohort_p) DAY,
                '%Y-%m-%d') AS cohort_period,
       c.active_p - c.cohort_p AS period_offset,
       c.n_active, s.n_cohort,
       c.n_active * 1000000 // s.n_cohort AS retention_ppm
FROM cells c JOIN sizes s ON c.cohort_p = s.cohort_p
"""


@query("cohort_retention", _COHORT_ORACLE)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort-retention triangle (operators/sequence.cohort_retention)
    at DAILY grain (the testdata spans 30 days): users cohorted by
    first-event day; per (cohort, day-offset) cell the distinct active
    members and an integer-exact parts-per-million retention share.
    Periods compare as days-since-epoch integers — no calendar
    arithmetic to disagree on; the cohort-size side is broadcast
    (≤ horizon-days rows)."""
    ev = _t(spark, sf_dir, "events")
    from .operators.sequence import cohort_retention

    return cohort_retention(
        ev, key_col="user_id", ts_col="ts", granularity="day"
    )
