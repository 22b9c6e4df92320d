"""Binned interval-overlap join: brute-force equality, closed-interval
boundary semantics, single emission across bins, guards, plan pin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olist_snowflake_dbt_spark.operators.timeseries import (
    interval_overlap_join,
)


def _iv(spark, rows, id_name):
    return spark.createDataFrame(rows, f"{id_name} long, s long, e long")


class TestIntervalOverlapJoin:
    def test_matches_brute_force_exactly(self, spark, sf_dir):
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        day = F.datediff(
            F.to_date("o_orderdate"), F.to_date(F.lit("1992-01-01"))
        )
        iv = orders.select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("okey"),
            day.alias("s"),
            (day + F.col("o_orderkey") % 20).alias("e"),
        )
        blocked = interval_overlap_join(
            iv.withColumnRenamed("okey", "a"),
            iv.withColumnRenamed("okey", "b"),
            bin_size=16,
            left_id="a",
            right_id="b",
            start_col="s",
            end_col="e",
            partition_cols=("custkey",),
        ).filter(F.col("a") < F.col("b"))
        brute = (
            iv.alias("x")
            .join(
                iv.alias("y"),
                (F.col("x.custkey") == F.col("y.custkey"))
                & (F.col("x.okey") < F.col("y.okey"))
                & (F.col("x.s") <= F.col("y.e"))
                & (F.col("y.s") <= F.col("x.e")),
            )
            .select(
                F.col("x.custkey").alias("custkey"),
                F.col("x.okey").alias("a"),
                F.col("y.okey").alias("b"),
            )
        )
        got = {(r["custkey"], r["a"], r["b"]) for r in blocked.collect()}
        want = {(r["custkey"], r["a"], r["b"]) for r in brute.collect()}
        assert got == want and len(got) > 0

    def test_touching_endpoints_overlap_closed_intervals(self, spark):
        left = _iv(spark, [(1, 0, 10)], "a")
        right = _iv(spark, [(2, 10, 20)], "b")
        out = interval_overlap_join(
            left, right, bin_size=4, left_id="a", right_id="b", start_col="s", end_col="e"
        ).collect()
        assert len(out) == 1
        assert out[0]["overlap_start"] == 10
        assert out[0]["overlap_end"] == 10
        assert out[0]["overlap_len"] == 1

    def test_adjacent_but_disjoint_excluded(self, spark):
        left = _iv(spark, [(1, 0, 9)], "a")
        right = _iv(spark, [(2, 10, 20)], "b")
        assert (
            interval_overlap_join(
                left, right, bin_size=4, left_id="a", right_id="b", start_col="s", end_col="e"
            ).count()
            == 0
        )

    def test_single_emission_across_many_shared_bins(self, spark):
        """A pair sharing 10 bins must appear exactly once."""
        left = _iv(spark, [(1, 0, 40)], "a")
        right = _iv(spark, [(2, 0, 40)], "b")
        out = interval_overlap_join(
            left, right, bin_size=4, left_id="a", right_id="b", start_col="s", end_col="e"
        ).collect()
        assert len(out) == 1
        assert out[0]["overlap_len"] == 41

    def test_guards(self, spark):
        df = _iv(spark, [(1, 0, 1)], "id")
        with pytest.raises(ValueError, match="bin_size"):
            interval_overlap_join(df, df, bin_size=0, left_id="a", right_id="b", start_col="s", end_col="e")
        with pytest.raises(ValueError, match="must differ"):
            interval_overlap_join(df, df, bin_size=1, start_col="s", end_col="e")

    def test_no_cartesian_in_plan(self, spark):
        left = _iv(spark, [(1, 0, 10)], "a")
        right = _iv(spark, [(2, 5, 15)], "b")
        plan = (
            interval_overlap_join(
                left, right, bin_size=4, left_id="a", right_id="b", start_col="s", end_col="e"
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan
