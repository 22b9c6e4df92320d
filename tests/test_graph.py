"""Integer-exact PageRank: hand-checked redistribution, exact mass
conservation, dangling-node semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from olist_snowflake_dbt_spark.operators.graph import integer_pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_pagerank_hand_checked_two_rounds(spark):
    # 1→{2,3} (deg 2), 2→{1}, 3 dangling; init 1000 points each
    e = _edges(spark, [(1, 2), (1, 3), (2, 1)])
    got = {
        r.node: r.pagerank_points
        for r in integer_pagerank(e, iterations=2, init_points=1000).collect()
    }
    # round 1: per-edge floor(850/2)=425 from 1; 850 from 2; 3 keeps all
    #   → {1: 150+850, 2: 150+425, 3: 1000+425}
    # round 2: 1 sends 425×2 (kept 150), 2 sends floor(488.75)=488
    #   (kept 87), 3 keeps 1425
    assert got == {1: 638, 2: 512, 3: 1850}


def test_pagerank_conserves_total_mass_exactly(spark):
    e = _edges(
        spark,
        [(a, b) for a in range(6) for b in range(6) if (a * 7 + b) % 3 == 0 and a != b],
    )
    n_nodes = (
        e.select(F.col("src").alias("n"))
        .unionByName(e.select(F.col("dst").alias("n")))
        .distinct()
        .count()
    )
    for iters in (1, 4):
        out = integer_pagerank(e, iterations=iters, init_points=1_000_000)
        total = out.agg(F.sum("pagerank_points").alias("t")).collect()[0].t
        assert total == n_nodes * 1_000_000


def test_pagerank_ranks_hub_highest(spark):
    # star with spokes pointing at the hub (and back-edges so nothing
    # strands): hub must out-rank every spoke
    spokes = list(range(1, 9))
    e = _edges(spark, [(s, 0) for s in spokes] + [(0, s) for s in spokes])
    got = {
        r.node: r.pagerank_points
        for r in integer_pagerank(e, iterations=5).collect()
    }
    assert all(got[0] > got[s] for s in spokes)


def test_pagerank_deterministic_across_partitionings(spark):
    pairs = [(a, (a * 13 + 5) % 20) for a in range(20) if a != (a * 13 + 5) % 20]
    e1 = _edges(spark, pairs).repartition(1)
    e2 = _edges(spark, pairs).repartition(16)
    r1 = {r.node: r.pagerank_points for r in integer_pagerank(e1, iterations=3).collect()}
    r2 = {r.node: r.pagerank_points for r in integer_pagerank(e2, iterations=3).collect()}
    assert r1 == r2


class TestTriangleCounts:
    def _tc(self, spark, edges):
        from olist_snowflake_dbt_spark.operators.graph import triangle_counts

        df = spark.createDataFrame(edges, "src long, dst long")
        return {
            r["node"]: r["n_triangles"]
            for r in triangle_counts(df).collect()
        }

    def test_single_triangle(self, spark):
        got = self._tc(spark, [(1, 2), (2, 3), (1, 3)])
        assert got == {1: 1, 2: 1, 3: 1}

    def test_direction_duplicates_and_self_loops_ignored(self, spark):
        """(2,1) duplicates (1,2); (3,3) is a self-loop: still 1."""
        got = self._tc(
            spark, [(1, 2), (2, 1), (2, 3), (1, 3), (3, 3)]
        )
        assert got == {1: 1, 2: 1, 3: 1}

    def test_k4_counts(self, spark):
        """K4 has 4 triangles; every node sits in exactly 3."""
        edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        got = self._tc(spark, edges)
        assert got == {0: 3, 1: 3, 2: 3, 3: 3}
        assert sum(got.values()) // 3 == 4

    def test_path_has_no_triangle(self, spark):
        assert self._tc(spark, [(1, 2), (2, 3), (3, 4)]) == {}
