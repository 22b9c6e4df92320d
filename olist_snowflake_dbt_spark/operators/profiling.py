"""ANALYZE-style column profiling: per-column stats in one declared pass.

The warehouse counterpart is ``ANALYZE TABLE … COMPUTE STATISTICS FOR
COLUMNS`` / dbt docs' catalog stats: row count, null count, exact NDV,
min, max per column — the inputs a cost-based optimizer (and a data
engineer eyeballing a new 100 TB table) needs. Emitted in long format
(one row per column) so the profile of ANY table has one stable schema.

Scale notes: the profile is declared as a single aggregate over the
scan. Exact multi-column COUNT(DISTINCT) makes Catalyst expand the
input ×(n_distinct_aggs) before the partial aggregate (the documented
Expand cost — same trade discussed at hll_and_quantile_sketch); for
routine 100 TB profiling swap ``exact_ndv=False`` to HLL sketches
(``approx_count_distinct``, or persist partials per sketch_rollup_merge
and profile from those) and the Expand disappears. min/max/nulls are
plain partial aggregates either way — one exchange of ONE row per task.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, cols: Sequence[str], exact_ndv: bool = True
) -> DataFrame:
    """Long-format profile: (column_name, n_rows, n_nulls, ndv,
    min_val, max_val) per requested column; min/max rendered as strings
    (numerics via DECIMAL where exactness matters is the caller's
    projection choice — cast before profiling)."""
    if not cols:
        raise ValueError("profile_columns requires at least one column")
    ndv = (
        (lambda c: F.count_distinct(F.col(c)))
        if exact_ndv
        else (lambda c: F.approx_count_distinct(c))
    )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"__nulls_{c}"),
            ndv(c).cast("bigint").alias(f"__ndv_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nulls_{c}, __ndv_{c}, __min_{c}, __max_{c}" for c in cols
    )
    return one.selectExpr(
        "__n",
        f"stack({len(cols)}, {stack_args}) AS "
        "(column_name, n_nulls, ndv, min_val, max_val)",
    ).select(
        "column_name",
        F.col("__n").alias("n_rows"),
        "n_nulls",
        "ndv",
        "min_val",
        "max_val",
    )


def schema_drift(
    old: DataFrame,
    new: DataFrame,
) -> "DataFrame":
    """Schema-drift report between two relation versions (the
    check a pipeline runs before trusting a republished upstream table,
    and the warehouse-side view of dbt's on_schema_change handling):
    one row per changed column — ``added`` (new only), ``removed``
    (old only), ``type_changed`` (both, different dtype) — with the
    dtype on each side. Unchanged columns are omitted; an empty result
    means the contract held.

    Driver-side metadata only (schemas, not data): zero jobs, zero
    scans — safe to run before every consume at any table size. Column
    order changes are deliberately NOT drift (consumers select by
    name); use model contracts (runner.py) to pin ordering too."""
    spark = old.sparkSession
    o, n = dict(old.dtypes), dict(new.dtypes)
    rows = []
    for c in sorted(set(o) | set(n)):
        if c in o and c not in n:
            rows.append((c, "removed", o[c], None))
        elif c in n and c not in o:
            rows.append((c, "added", None, n[c]))
        elif o[c] != n[c]:
            rows.append((c, "type_changed", o[c], n[c]))
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("column", T.StringType(), False),
            T.StructField("change", T.StringType(), False),
            T.StructField("old_type", T.StringType(), True),
            T.StructField("new_type", T.StringType(), True),
        ]
    )
    return spark.createDataFrame(rows, schema)
