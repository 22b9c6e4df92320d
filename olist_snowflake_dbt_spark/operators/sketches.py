"""Count-min sketch: sub-linear frequency estimation / heavy hitters.

The CMS is the streaming-friendly answer to "how often does each of
10^9 tokens appear in 100 TB of text" when the exact groupBy-token
shuffle (one row per DISTINCT token through the exchange) is the
bottleneck: increments fold into a depth×width integer grid whose
partial aggregates combine map-side into ≤ depth·width rows TOTAL —
corpus-size-independent, mergeable across days/shards like the HLL
partials in sketch_rollup_merge, and queryable for any candidate set
after the fact.

Estimates overestimate only (collisions add, never subtract):
``exact ≤ est ≤ exact + ε·N`` with ε = e/width at depth ln(1/δ) —
pinned by pytest, not prose.

Hashing is the same engine-portable Kirsch-Mitzenmacher md5 family as
the Bloom filter (``dedup.bloom_build``) and MinHash: row j's bucket is
``(h1 + j·h2) mod width``, so a DuckDB oracle rebuilds the ENTIRE grid
bit-for-bit — the driver row proves integer-exact parity of build AND
probe, not a tolerance band.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import _M61 as HASH_MOD, md5_part60


def _cms_positions(col: str, depth: int, width: int) -> list[F.Column]:
    """Row-j bucket positions of a value — one md5, depth derived hashes."""
    digest = F.md5(F.col(col).cast("binary"))
    h1 = F.pmod(md5_part60(digest, 0), F.lit(HASH_MOD))
    h2 = F.pmod(md5_part60(digest, 1), F.lit(HASH_MOD))
    return [
        F.pmod(h1 + F.lit(j) * h2, F.lit(width)) for j in range(1, depth + 1)
    ]


def _explode_positions(
    df: DataFrame, col: str, depth: int, width: int, keep: list[str]
) -> DataFrame:
    """(keep…, j, bucket) — one row per (input row, sketch row)."""
    pairs = F.array(
        *[
            F.struct(F.lit(j + 1).alias("j"), p.alias("bucket"))
            for j, p in enumerate(_cms_positions(col, depth, width))
        ]
    )
    return df.select(*keep, F.explode(pairs).alias("__jp")).select(
        *keep, F.col("__jp.j").alias("j"), F.col("__jp.bucket").alias("bucket")
    )


def cms_build(
    df: DataFrame, col: str, depth: int = 4, width: int = 4096
) -> DataFrame:
    """Build the sketch: one count per occupied (j, bucket) cell —
    ≤ depth·width rows however large the input. The groupBy is
    map-side combinable on a tiny fixed key domain, so the exchange
    carries ~depth·width rows per upstream task, not per input row."""
    return (
        _explode_positions(df, col, depth, width, [])
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(
    candidates: DataFrame,
    cms: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 4096,
) -> DataFrame:
    """Point-query the sketch for each candidate value: est = min over
    the depth rows of the candidate's bucket counts. The sketch is
    ≤ depth·width rows → broadcast join; per candidate one min over
    depth rows. A candidate absent from the build stream reads 0-count
    cells → est 0 (left join + coalesce)."""
    probes = _explode_positions(candidates, col, depth, width, [col])
    joined = probes.join(F.broadcast(cms), ["j", "bucket"], "left")
    return joined.groupBy(col).agg(
        F.min(F.coalesce(F.col("c"), F.lit(0))).cast("bigint").alias("cms_est")
    )
