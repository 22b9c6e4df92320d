"""dbt-utils essentials — the community macros every real dbt project
imports on day one, re-expressed as Catalyst builders.

The reference project does not vendor dbt-utils, but its runtime layer
(dbt-core 1.11) is exactly what dbt-utils targets, and a migrating user's
models lean on these three families constantly:

- ``generate_surrogate_key(cols)``: md5 over the ``-``-joined stringified
  columns with NULL encoded as the sentinel
  ``_dbt_utils_surrogate_key_null_`` — byte-for-byte the dbt-utils
  algorithm (dbt_utils/macros/sql/generate_surrogate_key.sql), so keys
  minted here JOIN against keys minted by a real dbt-utils project.
- ``union_relations(frames)``: UNION ALL across relations with
  different column sets — missing columns NULL-filled, column order
  normalized, optional ``_dbt_source_relation`` provenance column.
- generic-test builders ``equal_rowcount`` / ``expression_is_true`` /
  ``at_least_one``: each returns a FAILING-ROWS frame pluggable into
  ``evaluate_test``/``TestSpec`` like every other test in the engine.

All map-only or single-aggregate shapes; nothing here shuffles more
than one count per relation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NULL_SENTINEL = "_dbt_utils_surrogate_key_null_"


def generate_surrogate_key(cols: Sequence[str | Column]) -> Column:
    """dbt-utils ``generate_surrogate_key``: ``md5(concat_ws('-',
    coalesce(cast(c as string), sentinel), ...))``. Deterministic,
    engine-portable (md5), join-compatible with dbt-utils-minted keys.
    NULL and the string ``'<sentinel>'`` collide by design — dbt-utils'
    documented tradeoff, kept for compatibility."""
    if not cols:
        raise ValueError("generate_surrogate_key needs at least one column")
    parts = [
        F.coalesce(
            (F.col(c) if isinstance(c, str) else c).cast("string"),
            F.lit(NULL_SENTINEL),
        )
        for c in cols
    ]
    return F.md5(F.concat_ws("-", *parts))


def union_relations(
    frames: Sequence[DataFrame],
    source_names: Sequence[str] | None = None,
    include_source_column: bool = True,
) -> DataFrame:
    """dbt-utils ``union_relations``: UNION ALL across relations whose
    column sets differ — the union schema is the FIRST-SEEN order of all
    columns, absent columns NULL-fill (``unionByName(allowMissingColumns
    =True)`` — types must be coercible, same as dbt-utils). With
    ``include_source_column`` each row carries its provenance in
    ``_dbt_source_relation``."""
    if not frames:
        raise ValueError("union_relations needs at least one frame")
    if source_names is not None and len(source_names) != len(frames):
        raise ValueError("source_names must match frames length")
    names = source_names or [f"relation_{i}" for i in range(len(frames))]
    tagged = []
    for df, name in zip(frames, names):
        if include_source_column:
            df = df.withColumn("_dbt_source_relation", F.lit(name))
        tagged.append(df)
    out = tagged[0]
    for df in tagged[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out


# -- generic-test builders (failing-rows contract) ---------------------


def equal_rowcount(a: DataFrame, b: DataFrame) -> DataFrame:
    """dbt-utils ``equal_rowcount`` test: failing-rows frame is EMPTY iff
    ``count(a) == count(b)``; otherwise one diagnostic row with both
    counts and the diff. Two map-side-combined counts, one row ever
    crosses the network."""
    ca = a.select(F.count(F.lit(1)).alias("count_a"))
    cb = b.select(F.count(F.lit(1)).alias("count_b"))
    joined = ca.crossJoin(cb).withColumn(
        "diff", F.abs(F.col("count_a") - F.col("count_b"))
    )
    return joined.filter(F.col("diff") != 0)


def expression_is_true(df: DataFrame, expression: str) -> DataFrame:
    """dbt-utils ``expression_is_true``: rows where the SQL expression is
    NOT true (false or NULL) are failures — NULL counts as failing,
    matching the macro's ``where not(<expr>)`` SQL semantics under
    3-valued logic."""
    cond = F.expr(expression)
    return df.filter(~F.coalesce(cond, F.lit(False)))


def at_least_one(df: DataFrame, column: str) -> DataFrame:
    """dbt-utils ``at_least_one``: fails when the column has no non-null
    values; failing-rows frame is a single diagnostic row in that case."""
    agg = df.select(F.count(F.col(column)).alias("n_nonnull"))
    return agg.filter(F.col("n_nonnull") == 0)
