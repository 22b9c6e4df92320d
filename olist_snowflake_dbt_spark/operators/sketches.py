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


def bitmap_ndv_partials(
    df: DataFrame,
    group_cols: list,
    id_col: str,
) -> DataFrame:
    """EXACT mergeable distinct-count partials as 64-bit bitmap words —
    the Snowflake ``BITMAP_BUCKET_NUMBER``/``BITMAP_CONSTRUCT_AGG``
    shape: per ``(group_cols…, word_idx)`` one BIGINT whose bit ``id %
    64`` is set for every ``id DIV 64 == word_idx`` seen. Store these
    once per fine grain (e.g. per day); any coarser rollup is
    :func:`bitmap_ndv_rollup` over the partials — exact NDV without
    EVER rescanning raw rows, the property approximate HLL partials
    (sketch_rollup_merge) give up precision for.

    Contract: ``id_col`` is a NON-NEGATIVE integer from a DENSE domain
    (dictionary-encode upstream) — partial size is id_domain/64 rows
    per group, which is the tradeoff that makes the merge exact; for
    sparse 2^63 domains use HLL instead. ``bit_or`` partials combine
    map-side; words through the exchange are bounded by the domain,
    not the row count.
    """
    word = F.expr(f"CAST(`{id_col}` AS BIGINT) DIV 64")
    bit = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST(`{id_col}` % 64 AS INT))"
    )
    return (
        df.select(*group_cols, word.alias("word_idx"), bit.alias("__bit"))
        .groupBy(*group_cols, "word_idx")
        .agg(F.expr("bit_or(__bit)").alias("bitmap"))
    )


def bitmap_ndv_rollup(
    partials: DataFrame,
    group_cols: list,
) -> DataFrame:
    """Roll bitmap partials up to a coarser grain and count: bitmaps
    union via ``bit_or`` per (subset keys, word), then ``ndv =
    SUM(bit_count(word))`` — set union in integer arithmetic, so the
    result is EXACTLY ``COUNT(DISTINCT id)`` at the rollup grain
    (duplicate ids across merged partials collapse into the same bit;
    pinned by the driver oracle, which IS ``COUNT(DISTINCT)``).
    """
    merged = partials.groupBy(*group_cols, "word_idx").agg(
        F.expr("bit_or(bitmap)").alias("bitmap")
    )
    return merged.groupBy(*group_cols).agg(
        F.expr("SUM(bit_count(bitmap))").cast("bigint").alias("ndv")
    )


def kmv_sketch(
    df: DataFrame,
    group_cols: list,
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """KMV (k-minimum-values) distinct-set sketch per group — the
    MERGEABLE sketch whose set ALGEBRA works: unlike a plain HLL
    register bank, two KMV sketches support union AND intersection
    estimates (:func:`kmv_set_ops`), the theta-sketch trick
    (Bar-Yossef et al. 2002 "Counting distinct elements in a data
    stream", RANDOM; Dasgupta et al. 2016 theta sketches — public
    knowledge, implemented natively).

    The sketch is the array of the k SMALLEST portable 60-bit md5
    hashes of the group's distinct values (sorted ascending; shorter
    than k ⇒ the group's full hash set, and every derived estimate is
    exact). Deterministic given the hash — a DuckDB oracle recomputes
    the identical sketch, which is how the driver verifies the whole
    estimate pipeline.

    Plan: one DISTINCT exchange on (group, hash) then one window top-k
    per group — the per-group heap never exceeds k, and the sketch
    that leaves the exchange is ≤ k longs per group whatever the
    corpus size (the same bounded-payload contract as cms_build).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    from pyspark.sql import Window

    from ..functions.hashing import portable_hash60

    per = df.select(
        *group_cols,
        portable_hash60(F.col(value_col).cast("string")).alias("__h"),
    ).distinct()
    w = Window.partitionBy(*group_cols).orderBy("__h")
    return (
        per.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .groupBy(*group_cols)
        .agg(F.sort_array(F.collect_list("__h")).alias("kmv"))
    )


# 2^60 — the portable-hash range; exact in a double (one mantissa bit)
_KMV_RANGE = float(1 << 60)


def _kmv_pair_frame(
    sketches: DataFrame,
    key_col: str,
    k: int,
    sketch_col: str,
) -> DataFrame:
    """Shared pair frame of the KMV set algebra: for every key pair
    (a < b) the merged sketch ``__mg`` (k smallest of the combined hash
    sets), the raw intersection ``__both`` of the two input sketches,
    the full-sketch flag ``__full`` and the UNROUNDED union estimate
    ``__ur`` — every derived estimate (intersection, difference,
    Jaccard) scales off ``__ur``, and rounding happens ONLY on the
    final output columns (a rounded intermediate would let the two
    engines land on opposite sides of a rounding boundary).

    Plan: a self-join of the GROUP-cardinality sketch table — pairs
    of ≤k-long arrays, never data rows.
    """
    a = sketches.select(
        F.col(key_col).alias("key_a"), F.col(sketch_col).alias("__ka")
    )
    b = sketches.select(
        F.col(key_col).alias("key_b"), F.col(sketch_col).alias("__kb")
    )
    merged = F.slice(
        F.array_sort(F.array_union(F.col("__ka"), F.col("__kb"))), 1, k
    )
    both = F.array_intersect(F.col("__ka"), F.col("__kb"))
    full = F.size(F.col("__mg")) >= k
    union_raw = F.when(
        ~F.col("__full"), F.size(F.col("__mg")).cast("double")
    ).otherwise(
        F.lit((k - 1) * _KMV_RANGE)
        / F.element_at(F.col("__mg"), k).cast("double")
    )
    return (
        a.join(b, F.col("key_a") < F.col("key_b"))
        .withColumn("__mg", merged)
        .withColumn("__both", both)
        .withColumn("__full", full)
        .withColumn("__ur", union_raw)
    )


def kmv_set_ops(
    sketches: DataFrame,
    key_col: str,
    k: int = 256,
    sketch_col: str = "kmv",
) -> DataFrame:
    """Pairwise set-operation estimates over KMV sketches: for every
    key pair (a < b), the estimated |A ∪ B| and |A ∩ B| — the sketch
    algebra joins/audits at 100 TB pay one ≤k-long array per side for.

    Math (deterministic — both engines replay it bit-for-bit): the
    merged sketch is the k smallest of the combined hash sets. If it
    holds fewer than k values both inputs were complete, and union /
    intersection are EXACT set counts. Otherwise
    ``union_est = (k−1) · 2^60 / merged[k]`` (the classic k-th
    minimum estimator) and ``inter_est = |merged ∩ A ∩ B| · union_est
    / k`` (the theta-sketch intersection: the merged sketch is a
    uniform sample of the union). Doubles are safe cross-engine here:
    (k−1)·2^60 is exact in a double and the remaining ops are single
    IEEE roundings of identical inputs. ``inter_est`` scales off the
    UNROUNDED union estimate (the round-11 advisory: a rounded
    intermediate could land the two engines on opposite sides of a
    0.001 boundary); only the OUTPUT columns round, to 3 decimals.
    """
    p = _kmv_pair_frame(sketches, key_col, k, sketch_col)
    inter_in_mg = F.size(F.array_intersect(F.col("__mg"), F.col("__both")))
    union_est = F.when(
        ~F.col("__full"), F.col("__ur")
    ).otherwise(F.round(F.col("__ur"), 3))
    inter_est = F.when(
        ~F.col("__full"), F.size(F.col("__both")).cast("double")
    ).otherwise(
        F.round(
            inter_in_mg.cast("double") * F.col("__ur") / F.lit(float(k)),
            3,
        )
    )
    return (
        p.withColumn("union_est", union_est)
        .withColumn("inter_est", inter_est)
        .select("key_a", "key_b", "union_est", "inter_est")
    )


def kmv_diff_jaccard(
    sketches: DataFrame,
    key_col: str,
    k: int = 256,
    sketch_col: str = "kmv",
) -> DataFrame:
    """Set DIFFERENCE and JACCARD estimates over KMV sketches — the
    rest of the theta algebra (same merged-sample trick as
    :func:`kmv_set_ops`): for every key pair (a < b),
    ``diff_ab_est ≈ |A ∖ B|``, ``diff_ba_est ≈ |B ∖ A|`` and
    ``jaccard_est ≈ |A ∩ B| / |A ∪ B|``.

    Math: the merged sketch is a uniform sample of the union, and an
    element of it absent from B's sketch is truly absent from B (every
    merged element is ≤ merged[k] ≤ kb[k], so a B-member among them
    would be inside B's k smallest) — so
    ``diff_ab_est = |merged ∩ (A ∖ B)| · union_raw / k`` with the
    UNROUNDED union estimate, and ``jaccard_est = |merged ∩ A ∩ B| /
    k`` needs no union scaling at all (the factor cancels). The three
    fractions partition the merged sample, so
    ``inter + diff_ab + diff_ba = union`` by construction. Below k
    both inputs are complete and all outputs are exact set counts.
    Differences round to 3 decimals, Jaccard to 6 (it is a ratio in
    [0, 1]); all rounding is output-only.
    """
    p = _kmv_pair_frame(sketches, key_col, k, sketch_col)
    ab = F.size(
        F.array_intersect(
            F.col("__mg"), F.array_except(F.col("__ka"), F.col("__kb"))
        )
    )
    ba = F.size(
        F.array_intersect(
            F.col("__mg"), F.array_except(F.col("__kb"), F.col("__ka"))
        )
    )
    inter_in_mg = F.size(F.array_intersect(F.col("__mg"), F.col("__both")))

    def diff(in_mg: F.Column, exact: F.Column) -> F.Column:
        return F.when(~F.col("__full"), exact.cast("double")).otherwise(
            F.round(
                in_mg.cast("double") * F.col("__ur") / F.lit(float(k)), 3
            )
        )

    jaccard = F.when(
        ~F.col("__full"),
        F.round(
            F.size(F.col("__both")).cast("double")
            / F.size(F.col("__mg")).cast("double"),
            6,
        ),
    ).otherwise(F.round(inter_in_mg.cast("double") / F.lit(float(k)), 6))
    return (
        p.withColumn(
            "diff_ab_est",
            diff(ab, F.size(F.array_except(F.col("__ka"), F.col("__kb")))),
        )
        .withColumn(
            "diff_ba_est",
            diff(ba, F.size(F.array_except(F.col("__kb"), F.col("__ka")))),
        )
        .withColumn("jaccard_est", jaccard)
        .select("key_a", "key_b", "diff_ab_est", "diff_ba_est", "jaccard_est")
    )
