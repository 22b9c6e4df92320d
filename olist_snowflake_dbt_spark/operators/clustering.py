"""Distributed Lloyd k-means over ``array<float>`` embedding columns.

The iterative-ML workhorse of a training-data pipeline (corpus
clustering for curriculum mixing, dedup blocking, IVF index training),
expressed in pure DataFrame operators — no MLlib, no UDFs, no driver
collect of data rows.

Determinism contract (what makes this oracle-checkable):

- **Seeds** are the ``k`` corpus rows with the smallest md5(id) hex
  prefix — content-derived, engine-portable (the operators/sampling
  trick), never dependent on partition layout.
- **Assignment** distances are squared-L2 computed by a SEQUENTIAL
  left fold over the components (``F.aggregate`` over ``zip_with``
  products): IEEE double ops in a fixed order are bit-identical on any
  engine, so argmin + (distance, cell) tie-break is reproducible.
- **Centroid updates** accumulate in integer MICRO-UNITS:
  ``xq[j] = floor(x[j] * 1e6 + 0.5)`` per point (``floor(x + 0.5)``
  instead of ``round`` because round's tie behavior is engine-specific
  — the functions/vector.quantize8 precedent), summed as BIGINT (an
  order-independent distributed sum — double summation over an
  unordered groupBy would drift run-to-run), then
  ``c[j] = SUM(xq[j]) / (n * 1e6)`` — int64→double is exact below
  2^53 and double division is correctly rounded, so the quantized
  mean is bit-identical everywhere. The 1e-6 centroid quantization is
  noise relative to any real cluster separation.

Shape at 100 TB: each iteration is (1) a broadcast of k·dim doubles to
every executor and a map-side argmin over the corpus — no shuffle of
the points; (2) one shuffle of (cell, component) partial sums — k·dim
rows after map-side combine, independent of corpus size. The k-row
centroid frame is tiny; it is rebuilt per iteration and re-broadcast.
Empty clusters drop out (standard Lloyd behavior), identically on both
engines. Per-iteration lineage is truncated with ``localCheckpoint``
beyond 2 iterations so the plan does not grow exponentially.

Reference parity: the reference (dbt-on-Snowflake, /root/reference/
models) has no clustering surface; this is part of the LLM-pipeline
extension set alongside operators/similarity.ivf_topk (whose sampled
centroids are exactly kmeans iteration 0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SCALE = 1_000_000  # micro-unit quantization for exact centroid sums


def _quantized(vec):
    """array<bigint> micro-unit quantization of a float vector."""
    return F.transform(vec, lambda x: F.floor(x.cast("double") * _SCALE + 0.5).cast("long"))


def _sq_l2(vec, cent):
    """Squared L2 distance: sequential left fold (order-fixed, engine-
    exact) over per-component squared differences."""
    diffs = F.zip_with(vec, cent, lambda a, b: (a.cast("double") - b) * (a.cast("double") - b))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v)


def seed_centroids(df: DataFrame, vec_col: str, id_col: str, k: int) -> DataFrame:
    """The k corpus rows with the smallest md5(id) prefix, as
    ``(cell, c: array<double>)`` — identical derivation to
    similarity.ivf_topk's cells, quantized to micro-units so iteration
    0 sees the same precision as every later iteration."""
    return (
        df.select(F.col(id_col).alias("__sid"), _quantized(F.col(vec_col)).alias("__xq"))
        .withColumn("__h", F.substring(F.md5(F.col("__sid").cast("string")), 1, 16))
        .orderBy("__h")
        .limit(k)
        # partitionBy(lit): single-partition total order over the k
        # post-limit rows, declared (k-bounded — no scale hazard)
        .withColumn(
            "cell",
            F.row_number().over(
                Window.partitionBy(F.lit(0)).orderBy("__h", "__sid")
            )
            - 1,
        )
        .select(
            "cell",
            F.transform(
                F.col("__xq"), lambda v: v.cast("double") / F.lit(float(_SCALE))
            ).alias("c"),
        )
    )


def assign_clusters(points: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: broadcast the k-row centroid frame,
    map-side argmin with (distance, cell) tie-break. Adds ``cell``.

    The argmin is ``min(struct(__d2, cell))`` under a ``groupBy`` —
    lexicographic struct-min IS the (distance asc, cell asc) tie-break,
    and unlike a per-point window it is MAP-SIDE COMBINABLE: the n·k
    candidate rows (each dragging two dim-length arrays) collapse to n
    rows before the exchange instead of all shuffling into per-point
    sort groups. Measured at sf1 (n=20k, k=80): the window variant
    moved the whole 1.6M-row cross product through the shuffle and
    dominated the k-means wall; this shape shuffles n rows. The
    ``first()`` carries are exact — every candidate row of a point
    holds the same point payload."""
    joined = points.crossJoin(F.broadcast(centroids)).withColumn(
        "__d2", _sq_l2(F.col("__x"), F.col("c"))
    )
    carry = [c for c in points.columns if c != "__pid"]
    return (
        joined.groupBy("__pid")
        .agg(
            F.min(F.struct(F.col("__d2"), F.col("cell"))).alias("__best"),
            *[F.first(c).alias(c) for c in carry],
        )
        .withColumn("cell", F.col("__best")["cell"])
        .drop("__best")
    )


def _update_centroids(assigned: DataFrame) -> DataFrame:
    """New ``(cell, c)`` means from integer micro-unit sums: one
    shuffle of (cell, j) partial sums, k·dim rows post-combine."""
    comp = assigned.select("cell", F.posexplode("__xq").alias("j", "v"))
    sums = comp.groupBy("cell", "j").agg(F.sum("v").alias("s"))
    arrs = sums.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("j", "s"))), lambda t: t["s"]
        ).alias("__s_arr")
    )
    counts = assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("__n"))
    return arrs.join(counts, "cell").select(
        "cell",
        F.transform(
            F.col("__s_arr"),
            lambda s: s.cast("double") / (F.col("__n").cast("double") * F.lit(float(_SCALE))),
        ).alias("c"),
    )


def kmeans_lloyd(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 2,
) -> DataFrame:
    """Lloyd's k-means: deterministic seeds, ``iters`` rounds of
    (assign → integer-exact centroid update), returning the final
    assignment ``(id, cluster, cluster_size)``."""
    points = df.select(
        F.col(id_col),
        F.col(vec_col).alias("__x"),
        _quantized(F.col(vec_col)).alias("__xq"),
    ).withColumn("__pid", F.col(id_col))
    cents = seed_centroids(df, vec_col, id_col, k)
    assigned = assign_clusters(points, cents)
    for i in range(1, iters):
        cents = _update_centroids(assigned)
        assigned = assign_clusters(points, cents)
        if i >= 2:
            # beyond two rounds the nested window/crossJoin lineage
            # compounds; truncate it like dedup.connected_components
            assigned = assigned.localCheckpoint(eager=False)
    size_w = Window.partitionBy("cell")
    return assigned.select(
        F.col(id_col),
        F.col("cell").alias("cluster"),
        F.count(F.lit(1)).over(size_w).alias("cluster_size"),
    )


def prototype_prune(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    cluster_col: str,
    keep_fraction: float = 0.8,
) -> DataFrame:
    """SSL-prototype data pruning (Sorscher et al. 2022, "Beyond neural
    scaling laws", NeurIPS — public knowledge): per cluster, rank
    examples by distance to the cluster CENTROID and keep the
    ``ceil(keep_fraction · |cluster|)`` most prototypical (closest)
    ones — the cheap self-supervised pruning metric that paper shows
    can beat random subsampling, and the natural next stage after
    :func:`kmeans_lloyd` / before training-set packing.

    Exactness (engine-replayable ranks, no float summation anywhere):
    vectors quantize to micro-units (``floor(x·1e6 + 0.5)`` — the same
    fixed-point idiom as the k-means centroids above), and ranking
    uses the DIVISION-FREE integer form ``score_i = Σ_j (n·q_ij −
    S_j)²`` where ``S_j`` is the cluster's per-dimension micro-unit
    SUM and ``n`` its size: within a cluster this is ``n²`` times the
    squared L2 distance to the centroid, so the RANKING is identical
    while every quantity stays exact integer arithmetic (squares
    accumulate in DECIMAL(38,0) — bigint would overflow at
    |d| > 3·10⁹). Ties break by id.

    Plan: one posexplode → (cluster, dim) map-side-combinable integer
    sum (k·dim rows out) → sums collect to one array row per cluster
    and BROADCAST back → the per-row score folds in a single codegen'd
    zip_with/aggregate (no second explode) → one cluster-keyed window
    ranks. Window partitions are clusters — bounded by the k ∝ n
    discipline (the SemDeDup tractability argument).

    Returns ``(id_col, cluster_col, proto_rank, cluster_n, kept)``.
    """
    if not 0 < keep_fraction <= 1:
        raise ValueError(
            f"keep_fraction must be in (0, 1], got {keep_fraction}"
        )
    pts = df.select(
        F.col(id_col),
        F.col(cluster_col),
        _quantized(F.col(vec_col)).alias("__q"),
    )
    comp = pts.select(cluster_col, F.posexplode("__q").alias("__j", "__v"))
    sums = comp.groupBy(cluster_col, "__j").agg(F.sum("__v").alias("__s"))
    arrs = sums.groupBy(cluster_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("__j", "__s"))),
            lambda t: t["__s"],
        ).alias("__s_arr")
    )
    counts = pts.groupBy(cluster_col).agg(F.count(F.lit(1)).alias("cluster_n"))
    dims = F.broadcast(arrs.join(counts, cluster_col))
    n = F.col("cluster_n")
    diffs = F.zip_with(
        F.col("__q"),
        F.col("__s_arr"),
        lambda q, s: (n * q - s).cast("decimal(19,0)"),
    )
    score = F.aggregate(
        diffs,
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, d: (acc + (d * d).cast("decimal(38,0)")).cast(
            "decimal(38,0)"
        ),
    )
    w = Window.partitionBy(cluster_col).orderBy(
        F.col("__score").asc(), F.col(id_col).asc()
    )
    # ragged-input guard (round-12 advisory): a vector whose length
    # differs from its cluster's dimension makes zip_with NULL-pad, the
    # decimal fold yield a NULL score, and NULLS FIRST would then rank
    # the broken row as MOST prototypical — fail loudly in-plan instead
    # of silently promoting it. NULL vector elements hit the same guard
    # (their score is NULL too).
    score = F.when(
        (F.size("__q") == F.size("__s_arr")) & score.isNotNull(), score
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "prototype_prune: ragged or NULL vector in cluster "
                ),
                F.col(cluster_col).cast("string"),
                F.lit(" (all vectors in a cluster must share one "
                      "dimensionality)"),
            )
        )
    )
    return (
        pts.join(dims, cluster_col)
        .withColumn("__score", score)
        .withColumn("proto_rank", F.row_number().over(w))
        .withColumn(
            "kept",
            F.col("proto_rank")
            <= F.ceil(F.lit(float(keep_fraction)) * n).cast("int"),
        )
        .select(id_col, cluster_col, "proto_rank", "cluster_n", "kept")
    )
