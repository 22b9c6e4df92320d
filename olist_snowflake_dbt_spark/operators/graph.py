"""Graph-analytics operators for corpus curation: integer-exact
PageRank over an edge table.

Why a TRAINING-DATA engine ships PageRank: web-crawl curation ranks
hosts/documents by link connectivity to pick crawl seeds and to weight
corpus sampling (the CommonCrawl/OpenWebText lineage — "pages linked
from high-rank pages are higher quality"). The same shape ranks any
entity graph (customer↔supplier purchase graphs here, since the
testdata has no link column).

Why INTEGER-exact: float PageRank is order-dependent (the per-node sum
of double contributions depends on aggregation order, so two engines —
or two RUNS — disagree in the last ulp and a value-hash oracle can
never pass). This variant does the random-walk redistribution in
integer "points": each node donates ``floor(points·d_num/d_den)``,
split as ``floor(donation/outdeg)`` per out-edge, and KEEPS the
remainder (both floors). Total points are conserved exactly, every
engine computes bit-identical ranks, and the ordering converges to the
same ranking as float PageRank as ``init_points`` grows (the quantum is
1/init_points of a node's mass).

Scale shape (per iteration): one equi-join of the rank frame onto the
edge list's src (the edge frame is hash-partitioned on src once behind
the persist, so only the rank frame moves), one groupBy(dst) with
map-side combine. Rank state is (node, points, out-degree) — 24
bytes/node, carrying the static degree so no per-round degree join is
needed; ``localCheckpoint`` per round keeps the plan constant-size
exactly like :func:`~.dedup.connected_components`. A skewed in-degree
hub is an aggregation hot key with partial aggregation — not a join
explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def integer_pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 3,
    init_points: int = 1_000_000,
    damping_num: int = 85,
    damping_den: int = 100,
    checkpoint: bool = True,
) -> DataFrame:
    """(node, pagerank_points) after ``iterations`` rounds of exact
    integer mass redistribution over the directed edge list. Dangling
    nodes (no out-edges) keep their full mass each round — deterministic
    and conservation-preserving (feed a bidirectional edge list if the
    random-walk interpretation should never strand mass).

    All arithmetic is 64-bit integer ``div`` — no doubles anywhere, so
    results are bit-identical across engines and partitionings; the sum
    of ``pagerank_points`` always equals ``n_nodes * init_points``."""
    # round-14 shape (guide §2.4 — remove shuffles outright): the edge
    # list is hash-partitioned on ``src`` ONCE behind the persist, so
    # every round's edge⋈sending join and the one-time out-degree
    # aggregate find the big side already clustered on its key — the
    # unpartitioned form re-exchanged the FULL edge frame once per
    # round (same fix connected_components got in round 11). The
    # out-degree is static, so it rides the rank state (node, points,
    # deg) instead of being recomputed from ``e`` and re-joined every
    # round — one fewer aggregate + join per iteration, identical
    # integer math.
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    ).dropDuplicates()
    if checkpoint:
        e = e.repartition("src").persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .dropDuplicates()
    )
    outdeg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("__deg")
    )
    ranks = nodes.join(outdeg, "node", "left").select(
        "node",
        F.lit(init_points).cast("long").alias("pagerank_points"),
        F.coalesce(F.col("__deg"), F.lit(0).cast("long")).alias("__deg"),
    )
    if checkpoint:
        ranks = ranks.localCheckpoint()
    for _ in range(iterations):
        sending = (
            ranks.withColumn(
                "__per_edge",
                F.when(
                    F.col("__deg") > 0,
                    F.expr(
                        f"(pagerank_points * {damping_num} div {damping_den})"
                        " div __deg"
                    ),
                ).otherwise(F.lit(0).cast("long")),
            )
            .withColumn(
                "__kept",
                F.col("pagerank_points")
                - F.col("__per_edge") * F.col("__deg"),
            )
        )
        recv = (
            e.join(
                sending.select(F.col("node").alias("src"), "__per_edge"), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("__per_edge").alias("__recv"))
        )
        ranks = (
            sending.select("node", "__kept", "__deg")
            .join(recv, "node", "left")
            .select(
                "node",
                (F.col("__kept") + F.coalesce(F.col("__recv"), F.lit(0)))
                .cast("long")
                .alias("pagerank_points"),
                "__deg",
            )
        )
        if checkpoint:
            ranks = ranks.localCheckpoint()
    if checkpoint:
        e.unpersist()
    return ranks.select("node", "pagerank_points")


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node triangle participation counts over an undirected simple
    graph — the clustering-coefficient numerator, and the classic
    distributed-join graph workload (community density, spam/link-farm
    detection in web-graph curation).

    ``edges`` is an undirected edge list; it is canonicalized to
    ``u < v``, dedup'd, and self-loops dropped. Triangles enumerate via
    the ordered two-join: ``(u<v) ⋈ (v<w) ⋈ edge(u,w)`` — each triangle
    found EXACTLY once as its sorted triple, then exploded to its three
    member nodes for the per-node count. Returns ``(node, n_triangles)``
    for nodes in ≥1 triangle; total triangles = SUM(n)/3.

    Plan: two ordinary equi-join exchanges (on v, then (u,w)); the
    ordering predicates make every candidate path unique, so there is
    no distinct pass and no double counting to clean up. Skew = the
    max-degree hub (candidate paths grow with d²) — the standard
    mitigation at web scale is degree-ordered orientation (each edge
    directed toward the HIGHER-degree endpoint bounds paths by
    arboricity); stated here, not hidden, and AQE splits the hub
    partitions meanwhile.
    """
    canon = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") < F.col("v"))
        .distinct()
    )
    e1 = canon.alias("e1")
    e2 = canon.select(
        F.col("u").alias("v"), F.col("v").alias("w")
    ).alias("e2")
    e3 = canon.select(
        F.col("u").alias("u3"), F.col("v").alias("w3")
    ).alias("e3")
    tris = (
        e1.join(e2, "v")
        .join(
            e3,
            (F.col("e1.u") == F.col("e3.u3"))
            & (F.col("e2.w") == F.col("e3.w3")),
        )
        .select(F.col("e1.u").alias("u"), "v", "w")
    )
    return (
        tris.select(
            F.explode(F.array("u", "v", "w")).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
