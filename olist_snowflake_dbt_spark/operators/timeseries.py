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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    bin_size: int,
    left_id: str = "id",
    right_id: str = "id",
    start_col: str = "start",
    end_col: str = "end",
    partition_cols: tuple = (),
) -> DataFrame:
    """All (left, right) pairs whose CLOSED integer intervals
    ``[start, end]`` overlap (``l.start <= r.end AND r.start <=
    l.end``), by bin blocking — the temporal sibling of
    ``geo.grid_epsilon_join`` (same PBSM shape over one dimension, and
    the strategy behind warehouse range-join optimizations).

    Both sides carry NON-NEGATIVE INTEGER ``start_col <= end_col``
    (scale timestamps to days/seconds upstream — integer arithmetic
    keeps the refine exact and DIV truncation == floor). Each interval
    explodes to the bins it covers (``sequence(s DIV b, e DIV b)`` —
    bounded by interval_length/bin_size + 1, so pick ``bin_size`` near
    the typical interval length); candidates join on the bin (plus any
    ``partition_cols``, e.g. a tenant key, which also localize skew).
    A true pair shares every bin in its intersection, so emission is
    deduplicated WITHOUT a distinct pass: the pair is kept only in the
    first shared bin, ``GREATEST(l.start, r.start) DIV bin_size`` —
    which both sides necessarily cover.

    Returns ``(partition_cols..., left_id, right_id, overlap_start,
    overlap_end, overlap_len)`` with ``overlap_len = end - start + 1``
    (closed-interval day/second count). One ordinary equi-join exchange
    pair; candidates bounded by bin occupancy — no inequality-join
    cartesian fallback at any scale.
    """
    if bin_size <= 0:
        raise ValueError(f"bin_size must be positive (got {bin_size})")
    if left_id == right_id:
        raise ValueError(
            f"left_id and right_id must differ in the output "
            f"(both {left_id!r}) — alias one side upstream"
        )
    pcols = list(partition_cols)

    def binned(df: DataFrame, id_col: str) -> DataFrame:
        return df.select(
            *pcols,
            F.col(id_col),
            F.col(start_col),
            F.col(end_col),
            F.explode(
                F.sequence(
                    F.expr(f"CAST(`{start_col}` AS BIGINT) DIV {bin_size}"),
                    F.expr(f"CAST(`{end_col}` AS BIGINT) DIV {bin_size}"),
                )
            ).alias("__bin"),
        )

    l = binned(left, left_id).alias("l")
    r = binned(right, right_id).alias("r")
    ls, le = F.col(f"l.{start_col}"), F.col(f"l.{end_col}")
    rs, re_ = F.col(f"r.{start_col}"), F.col(f"r.{end_col}")
    o_start = F.greatest(ls, rs)
    o_end = F.least(le, re_)
    keys = ["__bin", *pcols]
    return (
        l.join(r, keys)
        .filter(ls <= re_)
        .filter(rs <= le)
        .filter(
            F.col("__bin")
            == F.expr(
                f"CAST(GREATEST(l.`{start_col}`, r.`{start_col}`) AS BIGINT) "
                f"DIV {bin_size}"
            )
        )
        .select(
            *pcols,
            F.col(f"l.{left_id}").alias(left_id),
            F.col(f"r.{right_id}").alias(right_id),
            o_start.alias("overlap_start"),
            o_end.alias("overlap_end"),
            (o_end - o_start + F.lit(1)).cast("long").alias("overlap_len"),
        )
    )
