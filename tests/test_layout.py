"""Z-order layout: Morton-key correctness and the locality property the
operator exists for — multi-dim min/max envelopes tighter than a 1-D
sort's on the secondary dimension."""

from __future__ import annotations

from pyspark.sql import functions as F

from olist_snowflake_dbt_spark.operators.layout import (
    scale_to_bits,
    zorder_key,
    zorder_stats,
)


def test_zorder_key_known_values(spark):
    # x=0b11, y=0b01: x bits at even positions (1 + 4), y bit0 at pos 1 (2)
    df = spark.createDataFrame([(3, 1), (0, 0), (255, 0), (0, 255)], "x long, y long")
    rows = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", zorder_key(F.col("x"), F.col("y"), 8).alias("z")).collect()
    }
    assert rows[(3, 1)] == 7
    assert rows[(0, 0)] == 0
    # all-x bits = even positions = 0b0101...01 over 16 bits
    assert rows[(255, 0)] == sum(1 << (2 * b) for b in range(8))
    assert rows[(0, 255)] == sum(1 << (2 * b + 1) for b in range(8))


def test_zorder_key_is_injective_on_grid(spark):
    df = spark.range(0, 64).select(
        (F.col("id") % 8).alias("x"), (F.col("id") / 8).cast("long").alias("y")
    )
    n = (
        df.select(zorder_key(F.col("x"), F.col("y"), 3).alias("z"))
        .distinct()
        .count()
    )
    assert n == 64


def test_scale_to_bits_bounds_and_degenerate(spark):
    df = spark.createDataFrame([(0,), (50,), (100,)], "v long")
    got = [
        r.s
        for r in df.select(
            scale_to_bits(F.col("v"), F.lit(0), F.lit(100), 8).alias("s")
        ).collect()
    ]
    assert got[0] == 0 and got[2] == 255 and 0 <= got[1] <= 255
    degen = df.select(
        scale_to_bits(F.col("v"), F.lit(5), F.lit(5), 8).alias("s")
    ).collect()
    assert all(r.s == 0 for r in degen)


def test_zorder_buckets_bound_both_dims_better_than_1d_sort(spark):
    # a 32x32 uniform grid: a 1-D sort on x gives y-envelopes spanning the
    # full [0, 31] range in EVERY bucket; Z-order buckets must bound y.
    df = spark.range(0, 1024).select(
        (F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("long").alias("y")
    )
    stats = zorder_stats(df, "x", "y", bits=5, bucket_bits=4).collect()
    assert sum(r.n_rows for r in stats) == 1024
    # 16 buckets over a 10-bit key: each z-range is a 64-cell quadrant —
    # both dims confined to a half/quarter of the domain, never the whole
    for r in stats:
        assert r.x_max - r.x_min <= 15
        assert r.y_max - r.y_min <= 15


def test_zorder_stats_single_shuffle_plan(spark):
    df = spark.range(0, 100).select(
        (F.col("id") % 10).alias("x"), (F.col("id") / 10).cast("long").alias("y")
    )
    plan = zorder_stats(df, "x", "y")._jdf.queryExecution().executedPlan().toString()
    # the scalar bounds come back via BroadcastNestedLoopJoin (1-row side);
    # the only partitioned exchange is the final groupBy + its sort
    assert "CartesianProduct" not in plan
