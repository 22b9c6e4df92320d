"""Driver query for the time-series regularization surface
(operators/timeseries.py): hourly gap-filled spines with LOCF and
linear interpolation, replayed step-for-step by the DuckDB oracle
(bucketing floor, keep-latest tie-break, island groups, epoch lerp)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.timeseries import gap_fill
from .queries import _t, query

_GAPFILL_ORACLE = """
WITH src AS (
    SELECT user_id, ts, event_id, value FROM events WHERE user_id < 6
),
obs AS (
    SELECT user_id, bucket, value AS observed FROM (
        SELECT user_id,
               CAST(to_timestamp(
                   (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600)
                   AS TIMESTAMP) AS bucket,
               value,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id,
                       (CAST(floor(epoch(ts)) AS BIGINT) // 3600)
                   ORDER BY ts DESC, event_id DESC, value DESC) AS rn
        FROM src
    ) WHERE rn = 1
),
spine AS (
    SELECT user_id,
           UNNEST(generate_series(lo, hi, INTERVAL 3600 SECOND)) AS bucket
    FROM (SELECT user_id, MIN(bucket) AS lo, MAX(bucket) AS hi
          FROM obs GROUP BY 1)
),
grid AS (
    SELECT s.user_id, s.bucket, o.observed
    FROM spine s LEFT JOIN obs o
      ON o.user_id = s.user_id AND o.bucket = s.bucket
),
g2 AS (
    SELECT *,
           COUNT(observed) OVER (PARTITION BY user_id ORDER BY bucket) AS grp,
           COUNT(observed) OVER (PARTITION BY user_id ORDER BY bucket DESC)
               AS rgrp
    FROM grid
),
g3 AS (
    SELECT user_id, bucket, observed,
           MAX(observed) OVER (PARTITION BY user_id, grp) AS prev_val,
           MAX(CASE WHEN observed IS NOT NULL THEN bucket END)
               OVER (PARTITION BY user_id, grp) AS prev_b,
           MAX(observed) OVER (PARTITION BY user_id, rgrp) AS next_val,
           MIN(CASE WHEN observed IS NOT NULL THEN bucket END)
               OVER (PARTITION BY user_id, rgrp) AS next_b
    FROM g2
)
SELECT user_id, bucket, observed,
       prev_val AS locf,
       CASE WHEN observed IS NOT NULL THEN observed
            WHEN prev_val IS NOT NULL AND next_val IS NOT NULL
                 AND CAST(floor(epoch(next_b)) AS BIGINT)
                     - CAST(floor(epoch(prev_b)) AS BIGINT) > 0
            THEN prev_val + (next_val - prev_val)
                 * (CAST(floor(epoch(bucket)) AS BIGINT)
                    - CAST(floor(epoch(prev_b)) AS BIGINT))
                 / (CAST(floor(epoch(next_b)) AS BIGINT)
                    - CAST(floor(epoch(prev_b)) AS BIGINT))
            ELSE prev_val END AS interp
FROM g3
"""


@query("gapfill_locf_interp", _GAPFILL_ORACLE)
def q_gapfill_locf_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill (operators/timeseries.gap_fill — the
    TimescaleDB ``time_bucket_gapfill(locf/interpolate)`` surface): 6
    users' event values on an hourly grid between each user's first and
    last observation; empty hours carry the last observation forward
    AND linearly interpolate between surrounding observations on epoch
    distance. The island-group formulation is replayed exactly by the
    oracle, so fill anchoring, edges (NULL before first obs, locf after
    last), and the lerp arithmetic are all hash-pinned."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 6)
    return gap_fill(
        e, key="user_id", ts="ts", value="value",
        step_seconds=3600, order_tiebreak="event_id",
    )


_OVERLAP_ORACLE = """
WITH iv AS (
    SELECT o_custkey AS custkey, o_orderkey AS okey,
           date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
               AS s,
           date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
               + o_orderkey % 20 AS e
    FROM orders
)
SELECT a.custkey, a.okey AS okey_a, b.okey AS okey_b,
       GREATEST(a.s, b.s) AS overlap_start,
       LEAST(a.e, b.e) AS overlap_end,
       LEAST(a.e, b.e) - GREATEST(a.s, b.s) + 1 AS overlap_len
FROM iv a JOIN iv b
  ON a.custkey = b.custkey AND a.okey < b.okey
 AND a.s <= b.e AND b.s <= a.e
"""


@query("interval_overlap_pairs", _OVERLAP_ORACLE)
def q_interval_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join (operators/timeseries.
    interval_overlap_join): pairs of the same customer's orders whose
    processing windows [orderdate, orderdate + orderkey%20 days]
    overlap — the temporal-conflict query (double bookings, concurrent
    sessions, SLA collisions). The operator bins intervals (bin=16
    days ≈ interval length), joins on (custkey, bin), refines with the
    exact closed-interval predicate, and emits each pair once in its
    first shared bin — NO inequality-join cartesian fallback; the
    DuckDB twin IS the brute inequality join, so the hash-match is a
    total-recall + exact-precision proof. Pair growth is linear in
    customers (orders-per-customer is bounded)."""
    epoch_day = F.datediff(
        F.to_date("o_orderdate"), F.to_date(F.lit("1992-01-01"))
    )
    iv = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("okey"),
        epoch_day.alias("s"),
        (epoch_day + F.col("o_orderkey") % 20).alias("e"),
    )
    from .operators.timeseries import interval_overlap_join

    pairs = interval_overlap_join(
        iv.withColumnRenamed("okey", "okey_a"),
        iv.withColumnRenamed("okey", "okey_b"),
        bin_size=16,
        left_id="okey_a",
        right_id="okey_b",
        start_col="s",
        end_col="e",
        partition_cols=("custkey",),
    )
    return pairs.filter(F.col("okey_a") < F.col("okey_b"))
