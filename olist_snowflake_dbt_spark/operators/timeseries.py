"""Time-series regularization: per-key gap-filled time spines with
last-observation-carried-forward and linear interpolation.

The TimescaleDB/`time_bucket_gapfill(locf/interpolate)` surface
(public docs), absent from both the reference and Spark's builtins —
composed here from sequence-explode + windows so Catalyst plans it as
ordinary exchanges:

1. bucket observations to the grid and keep the LATEST observation per
   (key, bucket) — a total tie-break keep-latest window;
2. generate each key's dense spine with ``sequence(min, max, step)``
   exploded executor-side (the spine multiplies rows AFTER the
   aggregate, never the raw scan);
3. left-join observations onto the spine;
4. fill via the ISLAND technique: ``grp = COUNT(value) OVER (ORDER BY
   bucket)`` increments exactly at non-null rows, so every row in a
   group shares ONE anchor observation — ``locf`` is the anchor's
   value; ``interpolate`` adds the mirrored reverse-group to find the
   NEXT anchor and lerps on epoch-second distance.

The island formulation is chosen over ``last_value(... IGNORE NULLS)``
deliberately: it is expressible identically on any engine (the oracle
replays it token-for-token) and never needs an unbounded-following
scan. Measured cost (`.explain`, sf0.001): FOUR exchanges — the
(key, bucket) keep-latest window, the per-key span aggregate, the
spine⋈observations join, and the key-partitioned fill windows (fwd +
rev + both island groups all share that last one). Each is on the
operator's natural grain; per-key state is O(key's span / step), which
is exactly the output size the caller asked for. Skewed keys (one user
spanning years) are AQE-splittable only across keys, not within; at
100 TB cap the spine span per key upstream (documented, not hidden).

Before a key's first observation both fills are NULL (nothing to carry);
after the last, ``locf`` holds and ``interpolate`` degrades to locf
(TimescaleDB's documented edge behavior).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    step_seconds: int = 3600,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Return one row per (key, grid bucket) between the key's first and
    last observation: ``bucket, observed (nullable), locf, interp``.

    ``observed`` is the latest raw observation in the bucket (ties
    broken by ``order_tiebreak`` then by value — total order);
    ``locf`` carries the last observation forward; ``interp`` linearly
    interpolates between surrounding observations on epoch time.
    """
    if step_seconds <= 0:
        raise ValueError(f"step_seconds must be positive, got {step_seconds}")
    step = F.lit(step_seconds)
    # normalize NTZ layouts to TIMESTAMP first (value-preserving under
    # the session's pinned UTC timezone) — NTZ has no direct long cast
    tcol, vcol = F.col(ts).cast("timestamp"), F.col(value)
    bucket = F.timestamp_seconds(
        (tcol.cast("long") / step).cast("long") * step
    )
    sel = [F.col(key), bucket.alias("bucket"), tcol.alias("__ts"), vcol.alias("__v")]
    tb = []
    if order_tiebreak:
        sel.append(F.col(order_tiebreak).alias("__tb"))
        tb = [F.col("__tb").desc()]
    w_latest = Window.partitionBy(key, "bucket").orderBy(
        F.col("__ts").desc(), *tb, F.col("__v").desc()
    )
    obs = (
        df.select(*sel)
        .withColumn("__rn", F.row_number().over(w_latest))
        .filter(F.col("__rn") == 1)
        .select(key, "bucket", F.col("__v").alias("observed"))
    )
    spine = (
        obs.groupBy(key)
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(
            key,
            F.explode(
                F.sequence(
                    "lo", "hi", F.expr(f"INTERVAL {step_seconds} SECONDS")
                )
            ).alias("bucket"),
        )
    )
    grid = spine.join(obs, [key, "bucket"], "left")
    w_fwd = (
        Window.partitionBy(key)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_rev = (
        Window.partitionBy(key)
        .orderBy(F.col("bucket").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grid = grid.withColumn("__grp", F.count("observed").over(w_fwd)).withColumn(
        "__rgrp", F.count("observed").over(w_rev)
    )
    wg = Window.partitionBy(key, "__grp")
    wr = Window.partitionBy(key, "__rgrp")
    prev_val = F.max("observed").over(wg)
    prev_b = F.max(
        F.when(F.col("observed").isNotNull(), F.col("bucket"))
    ).over(wg)
    next_val = F.max("observed").over(wr)
    next_b = F.min(
        F.when(F.col("observed").isNotNull(), F.col("bucket"))
    ).over(wr)
    span = next_b.cast("long") - prev_b.cast("long")
    num = F.col("bucket").cast("long") - prev_b.cast("long")
    # left-assoc (prev + (next-prev) * num / span): one double rounding
    # order shared with the SQL oracle — lerp is bit-identical
    interp = F.when(F.col("observed").isNotNull(), F.col("observed")).otherwise(
        F.when(
            prev_val.isNotNull() & next_val.isNotNull() & (span > 0),
            prev_val + (next_val - prev_val) * num / span,
        ).otherwise(prev_val)  # trailing edge: degrade to locf
    )
    return grid.select(
        key,
        "bucket",
        "observed",
        prev_val.alias("locf"),
        interp.alias("interp"),
    )
