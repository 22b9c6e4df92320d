from __future__ import annotations

import pytest

from olist_snowflake_dbt_spark.operators.clustering import (
    assign_clusters,
    kmeans_lloyd,
    seed_centroids,
)


@pytest.fixture(scope="module")
def separated(spark):
    """Three well-separated 4-d blobs: ids 0-9 near e1, 10-19 near e2,
    20-29 near e3 (offsets small vs the inter-blob distance of sqrt(200))."""
    rows = []
    for i in range(30):
        base = [0.0, 0.0, 0.0, 0.0]
        base[i // 10] = 10.0
        base[3] = (i % 10) * 0.01  # tiny within-blob jitter
        rows.append((i, base))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_kmeans_recovers_separated_blobs(spark, separated):
    out = kmeans_lloyd(separated, "embedding", "vec_id", k=3, iters=3).collect()
    assert len(out) == 30
    label_of = {r.vec_id: r.cluster for r in out}
    # every blob maps to exactly one cluster and blobs don't share labels
    blobs = [{label_of[i] for i in range(b * 10, b * 10 + 10)} for b in range(3)]
    assert all(len(b) == 1 for b in blobs)
    assert len({next(iter(b)) for b in blobs}) == 3
    assert all(r.cluster_size == 10 for r in out)


def test_kmeans_partition_layout_invariance(spark, separated):
    """Results must not depend on physical partitioning (the ivf_topk
    monotonically_increasing_id regression class)."""
    a = sorted(
        (r.vec_id, r.cluster, r.cluster_size)
        for r in kmeans_lloyd(separated, k=3, iters=2).collect()
    )
    b = sorted(
        (r.vec_id, r.cluster, r.cluster_size)
        for r in kmeans_lloyd(separated.repartition(7), k=3, iters=2).collect()
    )
    assert a == b


def test_seed_centroids_deterministic_and_k_rows(spark, separated):
    c1 = sorted((r.cell, tuple(r.c)) for r in seed_centroids(separated, "embedding", "vec_id", 5).collect())
    c2 = sorted((r.cell, tuple(r.c)) for r in seed_centroids(separated.coalesce(1), "embedding", "vec_id", 5).collect())
    assert c1 == c2
    assert [c for c, _ in c1] == list(range(5))


def test_assign_tie_breaks_to_lowest_cell(spark):
    """A point equidistant from two centroids goes to the lower cell id."""
    from pyspark.sql import functions as F

    pts = spark.createDataFrame([(1, [0.0, 0.0])], "vec_id long, embedding array<float>")
    pts = pts.select(
        "vec_id",
        F.col("embedding").alias("__x"),
        F.col("embedding").alias("__xq"),
        F.col("vec_id").alias("__pid"),
    )
    cents = spark.createDataFrame(
        [(7, [1.0, 0.0]), (3, [-1.0, 0.0])], "cell int, c array<double>"
    )
    out = assign_clusters(pts, cents).collect()
    assert len(out) == 1 and out[0].cell == 3


class TestPrototypePrune:
    """Round-12 SSL-prototype pruning: engine-exact centroid-distance
    ranks, fraction boundary, determinism, guards."""

    def _df(self, spark):
        # cluster 0: four points hugging the origin + one far outlier;
        # cluster 1: two identical points (tie broken by id)
        rows = [
            (1, [0.0, 0.0], 0),
            (2, [0.1, 0.0], 0),
            (3, [0.0, 0.1], 0),
            (4, [-0.1, 0.0], 0),
            (5, [10.0, 10.0], 0),
            (6, [1.0, 1.0], 1),
            (7, [1.0, 1.0], 1),
        ]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, cluster int"
        )

    def test_outlier_ranks_last_and_is_pruned(self, spark):
        from olist_snowflake_dbt_spark.operators.clustering import (
            prototype_prune,
        )

        out = {
            r.vec_id: (r.proto_rank, r.cluster_n, r.kept)
            for r in prototype_prune(
                self._df(spark), "embedding", "vec_id", "cluster", 0.8
            ).collect()
        }
        # ceil(0.8 * 5) = 4: the outlier (farthest from the centroid)
        # ranks 5th and is the one pruned
        assert out[5] == (5, 5, False)
        assert all(out[i][2] for i in (1, 2, 3, 4))
        # identical vectors tie-break by id; ceil(0.8 * 2) = 2 keeps both
        assert out[6] == (1, 2, True) and out[7] == (2, 2, True)

    def test_ranks_match_python_replay(self, spark):
        """Exactness: the integer form sum((n*q - S)^2) replayed in
        Python over the quantized vectors reproduces the ranks."""
        from olist_snowflake_dbt_spark.operators.clustering import (
            prototype_prune,
        )

        rows = [
            (i, [((i * 37) % 11) / 7.0, ((i * 53) % 13) / 9.0], i % 3)
            for i in range(30)
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, cluster int"
        )
        got = {
            r.vec_id: r.proto_rank
            for r in prototype_prune(
                df, "embedding", "vec_id", "cluster", 0.5
            ).collect()
        }
        import math
        from collections import defaultdict

        def quant(x):
            import struct

            f32 = struct.unpack("f", struct.pack("f", x))[0]
            return math.floor(f32 * 1_000_000 + 0.5)

        by_cluster = defaultdict(list)
        for i, vec, c in rows:
            by_cluster[c].append((i, [quant(x) for x in vec]))
        want = {}
        for c, members in by_cluster.items():
            n = len(members)
            sums = [sum(q[j] for _, q in members) for j in range(2)]
            scored = sorted(
                (sum((n * q[j] - sums[j]) ** 2 for j in range(2)), i)
                for i, q in members
            )
            for rank, (_s, i) in enumerate(scored, start=1):
                want[i] = rank
        assert got == want

    def test_keep_fraction_one_keeps_all_and_guard(self, spark):
        import pytest as _pytest

        from olist_snowflake_dbt_spark.operators.clustering import (
            prototype_prune,
        )

        out = prototype_prune(
            self._df(spark), "embedding", "vec_id", "cluster", 1.0
        )
        assert all(r.kept for r in out.collect())
        with _pytest.raises(ValueError, match="keep_fraction"):
            prototype_prune(
                self._df(spark), "embedding", "vec_id", "cluster", 0.0
            )

    def test_ragged_vectors_fail_loudly(self, spark):
        """Round-12 advisory: a cluster mixing 2-dim and 3-dim vectors
        must raise in-plan, not NULL-pad the short vector into the most
        prototypical rank (NULL score + NULLS FIRST ordering)."""
        import pytest as _pytest

        from olist_snowflake_dbt_spark.operators.clustering import (
            prototype_prune,
        )

        rows = [
            (1, [0.0, 0.0], 0),
            (2, [0.1, 0.0], 0),
            (3, [0.0, 0.1, 0.2], 0),  # ragged: 3 dims in a 2-dim cluster
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, cluster int"
        )
        with _pytest.raises(Exception, match="ragged or NULL"):
            prototype_prune(df, "embedding", "vec_id", "cluster", 0.8).collect()

    def test_null_element_fails_loudly(self, spark):
        """A NULL vector element NULLs the fold — same guard fires."""
        import pytest as _pytest

        from olist_snowflake_dbt_spark.operators.clustering import (
            prototype_prune,
        )

        rows = [(1, [0.0, 0.0], 0), (2, [0.1, None], 0)]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, cluster int"
        )
        with _pytest.raises(Exception, match="ragged or NULL"):
            prototype_prune(df, "embedding", "vec_id", "cluster", 0.8).collect()
