"""Grid-blocked spatial ε-join: exact equivalence with brute force,
boundary inclusivity, input guards, and the no-cartesian plan pin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olist_snowflake_dbt_spark.operators.geo import grid_epsilon_join
from olist_snowflake_dbt_spark.queries_geo import q_geo_grid_epsilon_join


def _points(spark, rows):
    return spark.createDataFrame(rows, "id long, x long, y long")


class TestGridEpsilonJoin:
    def test_matches_brute_force_exactly(self, spark, sf_dir):
        """Recall AND precision against the all-pairs reference: the
        grid plan must produce the identical pair multiset."""
        grid = q_geo_grid_epsilon_join(spark, sf_dir)
        cust = (
            spark.read.parquet(f"{sf_dir}/customer.parquet")
            .select(
                F.col("c_custkey").alias("cust_id"),
                ((F.col("c_custkey") * 48271) % 100000).alias("cx"),
                ((F.col("c_custkey") * 69621) % 100000).alias("cy"),
            )
        )
        supp = (
            spark.read.parquet(f"{sf_dir}/supplier.parquet")
            .select(
                F.col("s_suppkey").alias("supp_id"),
                ((F.col("s_suppkey") * 16807) % 100000).alias("sx"),
                ((F.col("s_suppkey") * 40692) % 100000).alias("sy"),
            )
        )
        d2 = (F.col("cx") - F.col("sx")) * (F.col("cx") - F.col("sx")) + (
            F.col("cy") - F.col("sy")
        ) * (F.col("cy") - F.col("sy"))
        brute = (
            cust.crossJoin(supp)
            .filter(d2 <= 1000 * 1000)
            .select("cust_id", "supp_id", d2.cast("long").alias("dist2"))
        )
        assert grid.count() == brute.count() > 0
        assert grid.exceptAll(brute).count() == 0
        assert brute.exceptAll(grid).count() == 0

    def test_boundary_inclusive_and_zero_distance(self, spark):
        """dist == eps exactly (cell boundary: the stencil must still
        see the +1 cell) and coincident points both match; a point just
        past eps does not."""
        left = _points(spark, [(1, 100, 100)])
        right = _points(
            spark,
            [
                (10, 100, 100),   # dist 0
                (11, 110, 100),   # dist == eps exactly, next cell over
                (12, 100, 111),   # dist eps+1 → excluded
            ],
        )
        right = right.withColumnRenamed("id", "rid")
        got = {
            (r.id, r.rid, r.dist2)
            for r in grid_epsilon_join(
                left, right, eps=10, left_id="id", right_id="rid"
            ).collect()
        }
        assert got == {(1, 10, 0), (1, 11, 100)}

    def test_each_true_pair_emitted_exactly_once(self, spark):
        """The right side is keyed by its unique home cell, so the 9-way
        stencil never double-counts a pair (no distinct pass in the
        plan to hide one)."""
        left = _points(spark, [(1, 55, 55)])
        right = _points(spark, [(20, 54, 56)]).withColumnRenamed("id", "rid")
        rows = grid_epsilon_join(
            left, right, eps=10, left_id="id", right_id="rid"
        ).collect()
        assert len(rows) == 1 and rows[0].dist2 == 2

    def test_input_guards(self, spark):
        pts = _points(spark, [(1, 0, 0)])
        with pytest.raises(ValueError, match="eps"):
            grid_epsilon_join(pts, pts, eps=0, left_id="a", right_id="b")
        with pytest.raises(ValueError, match="left_id"):
            grid_epsilon_join(pts, pts, eps=5)

    def test_plan_has_no_cartesian_and_stays_jvm_side(self, spark, sf_dir):
        spark.catalog.clearCache()
        plan = (
            q_geo_grid_epsilon_join(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan
        # one grid equi-join, not an all-pairs anything
        assert "Join" in plan


class TestGridNearestWithin:
    def test_matches_brute_force_topk(self, spark, sf_dir):
        from olist_snowflake_dbt_spark.queries_geo import q_geo_nearest_within
        from pyspark.sql import Window as W

        got = q_geo_nearest_within(spark, sf_dir)
        cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
            F.col("c_custkey").alias("cust_id"),
            ((F.col("c_custkey") * 48271) % 100000).alias("cx"),
            ((F.col("c_custkey") * 69621) % 100000).alias("cy"),
        )
        supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
            F.col("s_suppkey").alias("supp_id"),
            ((F.col("s_suppkey") * 16807) % 100000).alias("sx"),
            ((F.col("s_suppkey") * 40692) % 100000).alias("sy"),
        )
        d2 = (
            (F.col("cx") - F.col("sx")) * (F.col("cx") - F.col("sx"))
            + (F.col("cy") - F.col("sy")) * (F.col("cy") - F.col("sy"))
        ).cast("long")
        w = W.partitionBy("cust_id").orderBy("dist2", "supp_id")
        brute = (
            cust.crossJoin(supp)
            .withColumn("dist2", d2)
            .filter(F.col("dist2") <= 5000 * 5000)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 2)
            .select("cust_id", "supp_id", "dist2", "rank")
        )
        assert got.count() == brute.count() > 0
        assert got.exceptAll(brute).count() == 0

    def test_k_and_radius_semantics(self, spark):
        from olist_snowflake_dbt_spark.operators.geo import grid_nearest_within

        left = spark.createDataFrame([(1, 50, 50)], "id long, x long, y long")
        right = spark.createDataFrame(
            [(10, 51, 50), (11, 50, 53), (12, 47, 50), (13, 99, 99)],
            "rid long, x long, y long",
        )
        rows = sorted(
            grid_nearest_within(
                left, right, eps=10, k=2, left_id="id", right_id="rid"
            ).collect(),
            key=lambda r: r.rank,
        )
        # 13 is out of range; nearest two of the remaining three win
        assert [(r.rid, r.dist2, r.rank) for r in rows] == [
            (10, 1, 1),
            (11, 9, 2),
        ]


class TestGeohashEncode:
    def _gh(self, spark, lat_u, lng_u, precision=11):
        from olist_snowflake_dbt_spark.operators.geo import geohash_encode

        df = spark.createDataFrame([(lat_u, lng_u)], "lat long, lng long")
        return df.select(
            geohash_encode("lat", "lng", precision).alias("gh")
        ).collect()[0]["gh"]

    def test_canonical_vector(self, spark):
        """The textbook example: (57.64911, 10.40744) -> u4pruydqqvj."""
        assert self._gh(spark, 57_649_110, 10_407_440) == "u4pruydqqvj"

    def test_poles_and_antimeridian(self, spark):
        assert self._gh(spark, 90_000_000, 180_000_000) == "z" * 11
        assert self._gh(spark, -90_000_000, -180_000_000) == "0" * 11

    def test_prefix_is_containment(self, spark):
        """Nearby points share prefixes; the 11-char hash of a point
        starts with its own lower-precision hash."""
        full = self._gh(spark, 57_649_110, 10_407_440, 11)
        for p in (1, 4, 7):
            assert self._gh(spark, 57_649_110, 10_407_440, p) == full[:p]

    def test_guard(self, spark):
        import pytest as _pytest

        from olist_snowflake_dbt_spark.operators.geo import geohash_encode

        with _pytest.raises(ValueError, match="precision"):
            geohash_encode("a", "b", 13)
