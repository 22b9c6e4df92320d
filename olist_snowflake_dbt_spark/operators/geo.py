"""Geospatial distance joins via uniform grid blocking.

The olist reference dataset ships a geolocation table (zip-code
lat/lng) and its marts join customers to sellers spatially; this module
is the Spark-first shape of that workload (the reference's dbt models
have no custom engine for it — a warehouse does the join; SURVEY.md
§2 extension set). The synthetic testdata has no coordinates, so the
driver query derives deterministic integer coordinates from keys with
public Lehmer/LCG multipliers (Park-Miller 16807/48271, L'Ecuyer
40692/69621) — the geometry machinery is what's real.

Scale design (the PBSM / spatial-hash-join shape, Patel & DeWitt,
SIGMOD 1996): with cell size = eps, any pair within Euclidean distance
eps is also within Chebyshev distance eps, so the right-side point
lives in one of the left point's 3×3 neighbor cells — candidates are
bounded by cell occupancy, never all pairs. Both sides hash-partition
on the cell key (one ordinary equi-join exchange each); the exact
integer refine (dx²+dy² ≤ eps²) runs inside whole-stage codegen before
any pair leaves the join. No cartesian product at any scale; skew =
max points per cell, tunable via eps.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NEIGHBOR_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def grid_epsilon_join(
    left: DataFrame,
    right: DataFrame,
    eps: int,
    left_id: str = "id",
    right_id: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """All (left, right) pairs within Euclidean distance ``eps``
    (inclusive: dist² ≤ eps²) of each other, by grid blocking.

    Both inputs carry NON-NEGATIVE INTEGER coordinates in ``x_col`` /
    ``y_col`` (fixed-point scale your lat/lng upstream — integer
    arithmetic keeps the refine exact and engine-portable). The left
    side expands to its 3×3 neighbor cell stencil (9 rows — a bounded,
    shuffle-free explode); the right side is keyed by its own cell, so
    every true pair is found exactly once (the right point's home cell
    is unique) — no distinct pass needed. Recall is total: |dx| ≤ eps
    and |dy| ≤ eps imply the cells differ by at most 1 per axis, even
    when dx == eps exactly.

    Returns ``(left_id, right_id, dist2)`` with dist² as an exact
    BIGINT. Each output row costs one codegen'd multiply-add; only
    candidate pairs within colliding cells are ever materialized.
    """
    if eps <= 0:
        raise ValueError(f"eps must be positive (got {eps})")
    if left_id == right_id:
        raise ValueError(
            f"left_id and right_id must differ in the output "
            f"(both {left_id!r}) — alias one side upstream"
        )

    def cell(c: str) -> Column:
        # BIGINT DIV: integer-exact at any magnitude (no double detour);
        # truncation == floor for the non-negative coords required here.
        return F.expr(f"CAST(`{c}` AS BIGINT) DIV {int(eps)}")

    lx, ly = F.col(f"l.{x_col}"), F.col(f"l.{y_col}")
    rx, ry = F.col(f"r.{x_col}"), F.col(f"r.{y_col}")
    stencil = F.explode(
        F.array(
            *[
                F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                for dx, dy in _NEIGHBOR_OFFSETS
            ]
        )
    ).alias("__o")
    l_cells = left.select(
        F.col(left_id), F.col(x_col), F.col(y_col), stencil
    ).select(
        left_id,
        x_col,
        y_col,
        (cell(x_col) + F.col("__o.dx")).alias("__cx"),
        (cell(y_col) + F.col("__o.dy")).alias("__cy"),
    )
    r_cells = right.select(
        F.col(right_id),
        F.col(x_col),
        F.col(y_col),
        cell(x_col).alias("__cx"),
        cell(y_col).alias("__cy"),
    )
    dx, dy = lx - rx, ly - ry
    dist2 = (dx * dx + dy * dy).cast("long")
    return (
        l_cells.alias("l")
        .join(r_cells.alias("r"), ["__cx", "__cy"])
        .filter(dist2 <= eps * eps)
        .select(
            F.col(f"l.{left_id}").alias(left_id),
            F.col(f"r.{right_id}").alias(right_id),
            dist2.alias("dist2"),
        )
    )


def grid_nearest_within(
    left: DataFrame,
    right: DataFrame,
    eps: int,
    k: int = 1,
    left_id: str = "id",
    right_id: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Bounded k-nearest-neighbor: for each left point, its ``k``
    nearest right points WITHIN radius ``eps`` (left points with no
    right point in range produce no row — bounded-radius semantics,
    stated rather than hidden: unbounded exact kNN needs expanding ring
    searches whose worst case is the all-pairs join this module exists
    to avoid; pick eps from the 99th-percentile nearest distance of a
    sample instead).

    Plan: the :func:`grid_epsilon_join` candidates (bounded by cell
    occupancy) → one ``row_number`` window partitioned by the left id,
    ordered by exact integer dist² with the right id as the
    deterministic tiebreak. ONE extra exchange on the left id;
    candidates within eps are complete (grid recall is total), so the
    top-k is exact."""
    from pyspark.sql import Window as W

    pairs = grid_epsilon_join(
        left, right, eps, left_id=left_id, right_id=right_id,
        x_col=x_col, y_col=y_col,
    )
    w = W.partitionBy(left_id).orderBy("dist2", right_id)
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


_GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_encode(
    lat_col: str, lng_col: str, precision: int = 7
) -> Column:
    """Standard geohash (Niemeyer base32) of MICRODEGREE integer
    coordinate COLUMNS — the spatial bucketing key the rest of the
    world's geo tooling speaks, and a prefix-joinable alternative to
    this module's raw grid cells (geohashes share prefixes with
    containing cells, so ``substr(geohash, 1, k)`` IS the coarser
    join key).

    Fixed-point integer contract like the rest of the module:
    ``lat_col ∈ [-90e6, 90e6]``, ``lng_col ∈ [-180e6, 180e6]``
    microdegrees. Quantization is ONE integer cross-multiplication per
    axis (``(v + offset) · 2^bits DIV span``, the exact [0,1) mapping,
    with the single v == +edge value clamped into the last cell — no
    double can move a point across a cell edge), the bit interleave (lng
    first, MSB first, per the geohash spec) unrolls into shift-mask
    terms inside codegen, and each output char is a substr into the
    base32 alphabet literal — all trivially re-expressible in ANSI
    SQL, which is what the oracle does. Map-only; fuses into the
    feeding scan.
    """
    if not 1 <= precision <= 12:
        raise ValueError(f"precision must be in 1..12 (got {precision})")
    total_bits = 5 * precision
    lng_bits = (total_bits + 1) // 2
    lat_bits = total_bits // 2
    lat_q = F.expr(
        f"LEAST((CAST(`{lat_col}` AS BIGINT) + 90000000) "
        f"* {1 << lat_bits} DIV 180000000, {(1 << lat_bits) - 1})"
    )
    lng_q = F.expr(
        f"LEAST((CAST(`{lng_col}` AS BIGINT) + 180000000) "
        f"* {1 << lng_bits} DIV 360000000, {(1 << lng_bits) - 1})"
    )
    z = F.lit(0).cast("long")
    for i in range(total_bits):
        if i % 2 == 0:  # even interleave position: longitude, MSB first
            src, src_bits = lng_q, lng_bits
        else:
            src, src_bits = lat_q, lat_bits
        pos = i // 2
        bit = F.shiftright(src, src_bits - 1 - pos).bitwiseAND(F.lit(1))
        z = z + bit * F.lit(1 << (total_bits - 1 - i))
    chars = [
        F.substring(
            F.lit(_GEOHASH32),
            (
                F.shiftright(z, 5 * (precision - 1 - j))
                .bitwiseAND(F.lit(31))
                + F.lit(1)
            ).cast("int"),
            F.lit(1),
        )
        for j in range(precision)
    ]
    return F.concat(*chars)
