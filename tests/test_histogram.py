"""Equi-width histogram: WIDTH_BUCKET edge semantics, empty-bucket
completeness, conservation, and guards."""

from __future__ import annotations

import pytest

from olist_snowflake_dbt_spark.operators.profiling import equi_width_histogram


def _hist(spark, vals, **kw):
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = equi_width_histogram(df, "x", **kw)
    return {r["bucket"]: r for r in out.collect()}


class TestEquiWidthHistogram:
    def test_edges_are_width_bucket_semantics(self, spark):
        """lo is inclusive in bucket 1; an internal edge belongs to the
        upper bucket; hi itself overflows (half-open buckets)."""
        got = _hist(
            spark,
            [0.0, 9.99, 10.0, 19.99, 20.0, -0.01],
            lo=0, hi=20, n_buckets=2, scale=2,
        )
        assert got[0]["n_rows"] == 1      # -0.01 underflow
        assert got[1]["n_rows"] == 2      # 0.00, 9.99
        assert got[2]["n_rows"] == 2      # 10.00, 19.99
        assert got[3]["n_rows"] == 1      # 20.0 >= hi overflows

    def test_empty_buckets_present_with_zero(self, spark):
        got = _hist(spark, [5.0], lo=0, hi=100, n_buckets=10, scale=2)
        assert sorted(got) == list(range(12))
        assert got[1]["n_rows"] == 1
        assert all(got[b]["n_rows"] == 0 for b in got if b != 1)
        assert got[2]["min_val"] is None

    def test_conservation_and_null_exclusion(self, spark):
        df = spark.createDataFrame(
            [(1.0,), (2.0,), (None,), (99.0,)], "x double"
        )
        out = equi_width_histogram(df, "x", lo=0, hi=10, n_buckets=5)
        assert sum(r["n_rows"] for r in out.collect()) == 3  # NULL dropped

    def test_min_max_are_exact_decimal_strings(self, spark):
        got = _hist(spark, [1013.7, 1013.75], lo=0, hi=2000, n_buckets=1)
        assert got[1]["min_val"] == "1013.70"
        assert got[1]["max_val"] == "1013.75"

    def test_guards(self, spark):
        df = spark.createDataFrame([(1.0,)], "x double")
        with pytest.raises(ValueError, match="n_buckets"):
            equi_width_histogram(df, "x", lo=0, hi=1, n_buckets=0)
        with pytest.raises(ValueError, match="lo < hi"):
            equi_width_histogram(df, "x", lo=5, hi=5, n_buckets=2)


class TestEquiDepthHistogram:
    def test_near_equal_counts_and_ordered_ranges(self, spark):
        from olist_snowflake_dbt_spark.operators.profiling import (
            equi_depth_histogram,
        )

        df = spark.createDataFrame(
            [(float(i), i) for i in range(103)], "x double, id long"
        )
        rows = sorted(
            equi_depth_histogram(df, "x", 10, order_tiebreak="id").collect(),
            key=lambda r: r["bucket"],
        )
        counts = [r["n_rows"] for r in rows]
        # SQL ntile: first 103 % 10 = 3 tiles get 11, the rest 10
        assert counts == [11, 11, 11] + [10] * 7
        # ranges are contiguous and ordered
        for a, b in zip(rows, rows[1:]):
            assert float(a["max_val"]) <= float(b["min_val"])

    def test_null_exclusion_and_guard(self, spark):
        import pytest as _pytest

        from olist_snowflake_dbt_spark.operators.profiling import (
            equi_depth_histogram,
        )

        df = spark.createDataFrame(
            [(1.0, 1), (None, 2), (2.0, 3)], "x double, id long"
        )
        out = equi_depth_histogram(df, "x", 2, order_tiebreak="id")
        assert sum(r["n_rows"] for r in out.collect()) == 2
        with _pytest.raises(ValueError, match="n_buckets"):
            equi_depth_histogram(df, "x", 0)
