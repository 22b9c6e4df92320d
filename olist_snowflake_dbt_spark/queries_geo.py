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
