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
