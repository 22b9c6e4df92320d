"""Data-layout operators: Z-order (Morton) clustering keys and the
file-stats locality audit that justifies them.

Why this is a first-class 100-TB operator: a table physically ordered by
ONE column prunes on that column only; interleaving the bits of two (or
more) scaled dimensions into a single Morton key and range-partitioning
on it gives every output file a TIGHT min/max envelope on ALL the
interleaved dimensions at once — so parquet row-group / file skipping
works for multi-dimensional predicates (``user_id BETWEEN … AND value >
…``). This is exactly what Delta's ``OPTIMIZE ZORDER BY`` and Iceberg's
zorder sort-order do; here it is plain integer Catalyst arithmetic, so
it runs on any Spark and is bit-identical in any SQL oracle.

Everything is exact integer math (scale → interleave → bucket): no
floats, no UDFs, no shuffle until the final range-partition/groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scale_to_bits(v: Column, vmin: Column, vmax: Column, bits: int) -> Column:
    """Affinely map ``v`` ∈ [vmin, vmax] (all BIGINT) onto the integer
    grid [0, 2^bits): ``floor((v - vmin) * (2^bits - 1) / (vmax -
    vmin))``. Pure 64-bit integer arithmetic — overflow-safe for
    |v| ≤ ~2^47 at bits=16 — and portable (any engine computes the
    identical value). Degenerate range (vmax == vmin) maps to 0."""
    top = F.lit((1 << bits) - 1).cast("long")
    span = (vmax - vmin).cast("long")
    return F.when(span <= 0, F.lit(0).cast("long")).otherwise(
        ((v.cast("long") - vmin.cast("long")) * top / span).cast("long")
    )


def zorder_key(x: Column, y: Column, bits: int = 8) -> Column:
    """Morton (Z-order) interleave of two ``bits``-wide non-negative
    integers: bit b of ``x`` lands at position 2b, bit b of ``y`` at
    2b+1. Unrolled into 2·bits shift-and-mask terms — all inside
    whole-stage codegen, and trivially re-expressible in ANSI SQL
    (``(x // 2^b) % 2 * 2^(2b)``), which is what the oracle does."""
    z = F.lit(0).cast("long")
    for b in range(bits):
        z = z + (F.shiftright(x.cast("long"), b).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * b)))
        z = z + (F.shiftright(y.cast("long"), b).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * b + 1)))
    return z


def zorder_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 8,
    bucket_bits: int = 4,
) -> DataFrame:
    """The Z-order layout audit: scale (x, y) to the 2^bits grid using
    their global min/max, interleave into a Morton key, split the key
    space into ``2^bucket_bits`` equal Z-ranges (≙ output files of an
    ``OPTIMIZE ZORDER``), and report each bucket's row count and its
    min/max envelope on BOTH dimensions. Tight envelopes = file-level
    pruning works on either predicate; that is the property this
    operator exists to prove (and `tests/test_layout.py` asserts it
    beats a 1-D sort's y-envelope).

    Plan shape: one scalar min/max aggregate (broadcast back as a 1-row
    cross join — the standard scalar-subquery shape used across this
    repo), one map-only key computation, one groupBy(bucket) — a single
    data shuffle at any scale. Writing the layout for real is
    ``df.repartitionByRange(n, "zkey").sortWithinPartitions("zkey")``
    followed by the parquet sink; the stats here are exactly the
    min/max file statistics that parquet would then carry."""
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    bounds = df.agg(
        F.min(x).alias("__xmin"),
        F.max(x).alias("__xmax"),
        F.min(y).alias("__ymin"),
        F.max(y).alias("__ymax"),
    )
    keyed = (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("__sx", scale_to_bits(x, F.col("__xmin"), F.col("__xmax"), bits))
        .withColumn("__sy", scale_to_bits(y, F.col("__ymin"), F.col("__ymax"), bits))
        .withColumn("zkey", zorder_key(F.col("__sx"), F.col("__sy"), bits))
        .withColumn(
            "zbucket",
            F.shiftright(F.col("zkey"), 2 * bits - bucket_bits).cast("long"),
        )
    )
    return (
        keyed.groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(x).alias("x_min"),
            F.max(x).alias("x_max"),
            F.min(y).alias("y_min"),
            F.max(y).alias("y_max"),
        )
        .orderBy("zbucket")
    )
