"""Driver queries for the geospatial grid-join surface.

The oracle is the BRUTE-FORCE distance join (DuckDB cross join +
WHERE), so the hash-match is simultaneously a total-recall and an
exact-precision proof for the grid-blocked plan: any candidate the
stencil missed, or any false pair the refine let through, would flip
the hash. Coordinates are deterministic integers derived from keys
with public Lehmer/LCG multipliers (Park-Miller 16807/48271, L'Ecuyer
40692/69621), so both engines build identical point sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.geo import grid_epsilon_join
from .queries import _t, query

_GEO_EPS = 1000  # of a 100k × 100k integer plane

_GEO_GRID_ORACLE = f"""
WITH c AS (
    SELECT c_custkey AS cust_id,
           (c_custkey * 48271) % 100000 AS x,
           (c_custkey * 69621) % 100000 AS y
    FROM customer
),
s AS (
    SELECT s_suppkey AS supp_id,
           (s_suppkey * 16807) % 100000 AS x,
           (s_suppkey * 40692) % 100000 AS y
    FROM supplier
)
SELECT c.cust_id, s.supp_id,
       CAST((c.x - s.x) * (c.x - s.x)
          + (c.y - s.y) * (c.y - s.y) AS BIGINT) AS dist2
FROM c, s
WHERE (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y)
      <= {_GEO_EPS * _GEO_EPS}
"""


@query("geo_grid_epsilon_join", _GEO_GRID_ORACLE)
def q_geo_grid_epsilon_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial ε-join (operators/geo.grid_epsilon_join): every
    customer-supplier pair within Euclidean distance 1000 on a
    synthetic 100k×100k integer plane. The grid plan joins on 3×3
    neighbor cells and refines with exact integer dist² — candidates
    bounded by cell occupancy, no cartesian product at any scale. The
    DuckDB twin is the all-pairs brute force, so the hash-match proves
    the blocking loses nothing and the refine admits nothing extra."""
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust_id"),
        ((F.col("c_custkey") * 48271) % 100000).alias("x"),
        ((F.col("c_custkey") * 69621) % 100000).alias("y"),
    )
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("supp_id"),
        ((F.col("s_suppkey") * 16807) % 100000).alias("x"),
        ((F.col("s_suppkey") * 40692) % 100000).alias("y"),
    )
    return grid_epsilon_join(
        cust, supp, eps=_GEO_EPS, left_id="cust_id", right_id="supp_id"
    )


_GEO_NEAREST_ORACLE = """
WITH c AS (
    SELECT c_custkey AS cust_id,
           (c_custkey * 48271) % 100000 AS x,
           (c_custkey * 69621) % 100000 AS y
    FROM customer
),
s AS (
    SELECT s_suppkey AS supp_id,
           (s_suppkey * 16807) % 100000 AS x,
           (s_suppkey * 40692) % 100000 AS y
    FROM supplier
),
p AS (
    SELECT c.cust_id, s.supp_id,
           CAST((c.x - s.x) * (c.x - s.x)
              + (c.y - s.y) * (c.y - s.y) AS BIGINT) AS dist2
    FROM c, s
    WHERE (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y) <= 25000000
)
SELECT cust_id, supp_id, dist2, CAST(rank AS INT) AS rank
FROM (SELECT p.*,
             row_number() OVER (PARTITION BY cust_id
                                ORDER BY dist2, supp_id) AS rank
      FROM p)
WHERE rank <= 2
"""


@query("geo_nearest_within", _GEO_NEAREST_ORACLE)
def q_geo_nearest_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded kNN (operators/geo.grid_nearest_within): the 2 nearest
    suppliers within radius 5000 of each customer — the grid ε-join
    candidates topped by one row_number window (dist², then supp_id as
    the deterministic tiebreak). The oracle ranks the brute-force
    all-pairs set, so the hash-match proves the blocked candidate set
    was complete enough for an EXACT top-k."""
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust_id"),
        ((F.col("c_custkey") * 48271) % 100000).alias("x"),
        ((F.col("c_custkey") * 69621) % 100000).alias("y"),
    )
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("supp_id"),
        ((F.col("s_suppkey") * 16807) % 100000).alias("x"),
        ((F.col("s_suppkey") * 40692) % 100000).alias("y"),
    )
    from .operators.geo import grid_nearest_within

    return grid_nearest_within(
        cust, supp, eps=5000, k=2, left_id="cust_id", right_id="supp_id"
    )


_GEOHASH_ORACLE = """
WITH pts AS (
    SELECT c_custkey AS cust_id,
           (c_custkey * 40692) % 180000001 - 90000000 AS lat_u,
           (c_custkey * 69621) % 360000001 - 180000000 AS lng_u
    FROM customer
),
q AS (
    SELECT cust_id, lat_u, lng_u,
           LEAST((lat_u + 90000000) * 131072 // 180000000, 131071) AS lat_q,
           LEAST((lng_u + 180000000) * 262144 // 360000000, 262143) AS lng_q
    FROM pts
),
iz AS (
    SELECT cust_id, lat_u, lng_u,
           ((lng_q // 131072) % 2) * 17179869184
         + ((lat_q // 65536) % 2) * 8589934592
         + ((lng_q // 65536) % 2) * 4294967296
         + ((lat_q // 32768) % 2) * 2147483648
         + ((lng_q // 32768) % 2) * 1073741824
         + ((lat_q // 16384) % 2) * 536870912
         + ((lng_q // 16384) % 2) * 268435456
         + ((lat_q // 8192) % 2) * 134217728
         + ((lng_q // 8192) % 2) * 67108864
         + ((lat_q // 4096) % 2) * 33554432
         + ((lng_q // 4096) % 2) * 16777216
         + ((lat_q // 2048) % 2) * 8388608
         + ((lng_q // 2048) % 2) * 4194304
         + ((lat_q // 1024) % 2) * 2097152
         + ((lng_q // 1024) % 2) * 1048576
         + ((lat_q // 512) % 2) * 524288
         + ((lng_q // 512) % 2) * 262144
         + ((lat_q // 256) % 2) * 131072
         + ((lng_q // 256) % 2) * 65536
         + ((lat_q // 128) % 2) * 32768
         + ((lng_q // 128) % 2) * 16384
         + ((lat_q // 64) % 2) * 8192
         + ((lng_q // 64) % 2) * 4096
         + ((lat_q // 32) % 2) * 2048
         + ((lng_q // 32) % 2) * 1024
         + ((lat_q // 16) % 2) * 512
         + ((lng_q // 16) % 2) * 256
         + ((lat_q // 8) % 2) * 128
         + ((lng_q // 8) % 2) * 64
         + ((lat_q // 4) % 2) * 32
         + ((lng_q // 4) % 2) * 16
         + ((lat_q // 2) % 2) * 8
         + ((lng_q // 2) % 2) * 4
         + ((lat_q // 1) % 2) * 2
         + ((lng_q // 1) % 2) * 1 AS z
    FROM q
)
SELECT cust_id, lat_u, lng_u,
       substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST((z // 1073741824) % 32 AS INT) + 1, 1) || substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST((z // 33554432) % 32 AS INT) + 1, 1) || substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST((z // 1048576) % 32 AS INT) + 1, 1) || substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST((z // 32768) % 32 AS INT) + 1, 1) || substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST((z // 1024) % 32 AS INT) + 1, 1) || substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST((z // 32) % 32 AS INT) + 1, 1) || substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST((z // 1) % 32 AS INT) + 1, 1) AS geohash,
       substr(substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST((z // 1073741824) % 32 AS INT) + 1, 1) || substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST((z // 33554432) % 32 AS INT) + 1, 1) || substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST((z // 1048576) % 32 AS INT) + 1, 1) || substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST((z // 32768) % 32 AS INT) + 1, 1) || substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST((z // 1024) % 32 AS INT) + 1, 1) || substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST((z // 32) % 32 AS INT) + 1, 1) || substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST((z // 1) % 32 AS INT) + 1, 1), 1, 4) AS cell4
FROM iz
"""


@query("geo_geohash_encode", _GEOHASH_ORACLE)
def q_geo_geohash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash encoding (operators/geo.geohash_encode, Niemeyer base32,
    verified against the canonical u4pruydqqvj test vector in pytest):
    7-char hashes of deterministic microdegree coordinates derived from
    customer keys (public L'Ecuyer multipliers) plus the 4-char prefix
    — which IS the coarser spatial join key, the property that makes
    geohashes bucket-joinable at any zoom. Exact integer quantization
    and bit interleave; the oracle replays every shift-mask term in
    plain arithmetic. Map-only — fuses into the scan."""
    from .operators.geo import geohash_encode

    pts = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust_id"),
        ((F.col("c_custkey") * 40692) % 180000001 - 90000000).alias("lat_u"),
        ((F.col("c_custkey") * 69621) % 360000001 - 180000000).alias(
            "lng_u"
        ),
    )
    gh = geohash_encode("lat_u", "lng_u", precision=7)
    return pts.select(
        "cust_id",
        "lat_u",
        "lng_u",
        gh.alias("geohash"),
        F.substring(gh, 1, 4).alias("cell4"),
    )
