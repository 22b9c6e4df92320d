"""Entity resolution: blocking → bounded pairwise matching → transitive
clustering → golden-record consolidation.

The classic record-linkage pipeline (Fellegi–Sunter framing; at scale
the Dedoop/"blocking + match + cluster" shape every MDM system runs):

1. **Normalize** the match field (lower, collapse whitespace) so
   formatting noise never reaches the matcher.
2. **Block** on a caller-supplied key expression. Blocking is the ONLY
   thing standing between ER and an all-pairs crossJoin, so the key
   choice is the recall/cost dial — pick something robust to the
   expected corruption (digit suffixes survive letter typos, phonetic
   codes survive spelling noise). Same-block candidates meet in a plain
   equi-join: one shuffle on the block key, AQE-splittable if a block
   is hot.
3. **Match** within a block via a ±``max_dist`` length band (cheap
   prune) and Spark's thresholded ``levenshtein(a, b, max_dist)`` —
   the banded early-exit DP, JVM codegen, no UDF.
4. **Cluster** matched pairs with the exact min-label
   :func:`..operators.dedup.connected_components` (transitive: A~B,
   B~C ⇒ one entity even when A and C never matched directly).
5. **Consolidate** one golden record per entity: a single map-side-
   combinable aggregate (min/max/struct-min per attribute policy) —
   no per-cluster window, so a hot entity costs one row per upstream
   partition through the shuffle.

Reference scope note: the reference project models a single-source
warehouse (olist_snowflake_dbt models/*.sql) and has no ER; this is a
§2.C extension for multi-source mastering of the same schema.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import connected_components


def _norm(c: Column) -> Column:
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def candidate_pairs(
    records: DataFrame,
    id_col: str,
    name_col: str,
    block_expr: Column,
    max_dist: int = 2,
) -> DataFrame:
    """Blocked bounded-edit-distance candidate pairs ``(id_a, id_b,
    edit_distance)`` with ``id_a < id_b`` (undirected, no self-pairs)."""
    side = records.select(
        F.col(id_col).alias("__id"),
        _norm(F.col(name_col)).alias("__name"),
        block_expr.alias("__blk"),
    ).withColumn("__len", F.length("__name"))
    a, b = side.alias("a"), side.alias("b")
    return (
        a.join(b, F.col("a.__blk") == F.col("b.__blk"))
        .filter(F.col("a.__id") < F.col("b.__id"))
        .filter(
            F.abs(F.col("a.__len") - F.col("b.__len")) <= F.lit(max_dist)
        )
        .withColumn(
            "edit_distance",
            F.levenshtein(F.col("a.__name"), F.col("b.__name"), max_dist),
        )
        .filter(F.col("edit_distance") >= 0)  # threshold form: -1 = over budget
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            "edit_distance",
        )
    )


def golden_records(
    records: DataFrame,
    pairs: DataFrame,
    id_col: str,
    policies: dict[str, tuple[str, str]],
) -> DataFrame:
    """Consolidate one golden record per resolved entity.

    ``policies`` maps output column → ``(source_col, how)`` with ``how``
    one of ``min`` / ``max`` / ``canonical`` (the value held by the
    entity's canonical member, i.e. its smallest id — the usual
    "survivorship" rule for names/addresses). Returns one row per
    entity: ``entity_id`` (min member id), ``n_members``, plus the
    consolidated attributes. Unmatched records form singleton entities.
    """
    comp = connected_components(pairs)
    labeled = records.join(
        comp.withColumnRenamed("node", id_col),
        id_col,
        "left",
    ).withColumn(
        "entity_id", F.coalesce(F.col("component"), F.col(id_col))
    )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_members")]
    for out, (src, how) in policies.items():
        if how == "min":
            aggs.append(F.min(src).alias(out))
        elif how == "max":
            aggs.append(F.max(src).alias(out))
        elif how == "canonical":
            # value carried by the smallest member id: min over a
            # (id, value) struct, map-side combinable like the rest
            aggs.append(
                F.min(F.struct(F.col(id_col), F.col(src)))[src].alias(out)
            )
        else:
            raise ValueError(f"unknown survivorship policy: {how!r}")
    return labeled.groupBy("entity_id").agg(*aggs)


def resolve_entities(
    records: DataFrame,
    id_col: str,
    name_col: str,
    block_expr: Column,
    policies: dict[str, tuple[str, str]],
    max_dist: int = 2,
) -> DataFrame:
    """The full pipeline: candidate pairs → transitive clusters →
    golden records (see module docstring for the scale shape)."""
    pairs = candidate_pairs(records, id_col, name_col, block_expr, max_dist)
    return golden_records(records, pairs, id_col, policies)
