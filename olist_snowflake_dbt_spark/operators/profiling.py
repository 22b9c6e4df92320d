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

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F
from ..functions.local_frame import arrow_local_df


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
    return arrow_local_df(spark, rows, schema)


def equi_width_histogram(
    df: DataFrame,
    col: str,
    lo,
    hi,
    n_buckets: int,
    scale: int = 2,
) -> DataFrame:
    """Equi-width histogram with SQL WIDTH_BUCKET semantics, computed
    in EXACT integer arithmetic (engine-portable: no double rounding
    can move a value across a bucket edge).

    Bucket ``b`` ∈ 1..n covers ``[lo + (b-1)·w, lo + b·w)`` for
    ``w = (hi - lo) / n_buckets``; values below ``lo`` land in bucket
    0, values ``>= hi`` in bucket ``n_buckets + 1`` (the WIDTH_BUCKET
    under/overflow contract). The value, ``lo`` and ``hi`` are scaled
    by ``10^scale`` to BIGINT (pick ``scale`` ≥ the column's decimal
    scale — cents for money), so the bucket index is ONE integer
    cross-multiplication: ``(v - lo)·n DIV (hi - lo) + 1``.

    Returns ``(bucket, n_rows, min_val, max_val)`` for every bucket
    0..n+1 INCLUDING empty ones (a histogram with silently-missing
    bars misreads as a different distribution): the aggregate
    left-joins onto a generated 0..n+1 spine — broadcast-sized at any
    corpus size, like the aggregate itself (≤ n+2 rows through the
    exchange). NULL values are excluded (profile_columns reports
    them).

    Scale design: one map-side-combinable aggregate on the bucket id
    is the only data-sized work; everything else is expression math
    inside codegen. At 100 TB this is a scan + one exchange of ≤ n+2
    rows per task.
    """
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive (got {n_buckets})")
    if not lo < hi:
        raise ValueError(f"need lo < hi (got lo={lo}, hi={hi})")
    mult = 10 ** scale
    lo_i, hi_i = round(lo * mult), round(hi * mult)
    span = hi_i - lo_i
    v = F.expr(
        f"CAST(ROUND(CAST(`{col}` AS DECIMAL(38,{scale})) * {mult}, 0) "
        f"AS BIGINT)"
    )
    # integer floor: (v-lo)·n and span are non-negative here, so DIV
    # truncation == floor; expressed via expr to stay in BIGINT land.
    bucket = (
        F.when(v.isNull(), F.lit(None))
        .when(v < lo_i, F.lit(0))
        .when(v >= hi_i, F.lit(n_buckets + 1))
        .otherwise(
            F.expr(
                f"(CAST(ROUND(CAST(`{col}` AS DECIMAL(38,{scale})) * {mult}, 0) "
                f"AS BIGINT) - {lo_i}) * {n_buckets} DIV {span} + 1"
            )
        )
        .cast("int")
    )
    agg = (
        df.select(
            bucket.alias("bucket"),
            F.col(col).cast(f"decimal(38,{scale})").alias("__v"),
        )
        .filter(F.col("bucket").isNotNull())
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("__v").cast("string").alias("min_val"),
            F.max("__v").cast("string").alias("max_val"),
        )
    )
    spine = df.sparkSession.range(0, n_buckets + 2).select(
        F.col("id").cast("int").alias("bucket")
    )
    return spine.join(F.broadcast(agg), "bucket", "left").select(
        "bucket",
        F.coalesce("n_rows", F.lit(0)).alias("n_rows"),
        "min_val",
        "max_val",
    )


def equi_depth_histogram(
    df: DataFrame,
    col: str,
    n_buckets: int,
    order_tiebreak: str | None = None,
    scale: int = 2,
) -> DataFrame:
    """Equi-DEPTH histogram: ``n_buckets`` buckets holding (as close as
    possible to) equal row counts, with their value ranges — the
    complement of :func:`equi_width_histogram` (equal ranges, varying
    counts) and the shape optimizers build for selectivity on skewed
    columns, where equal-width buckets collapse into one hot bar.

    Implemented as ``ntile(n)`` over the value order (SQL-standard
    tiling: first ``mod`` tiles get the extra row) with
    ``order_tiebreak`` as the deterministic secondary sort — REQUIRED
    when values repeat, otherwise tile membership at value boundaries
    is engine-arbitrary. Returns ``(bucket, n_rows, min_val, max_val)``
    with the bounds rendered as exact DECIMAL(38, scale) strings.

    Scale note: ntile needs a TOTAL order — one global sort (stated,
    not hidden). At 100 TB compute approximate bucket EDGES instead
    (``approx_percentile(col, array(...))``, one aggregate) and bucket
    map-side by edge comparison; ntile is the exact-semantics path the
    oracle can replay, and the right tool below the sort-feasibility
    line. NULL values are excluded.
    """
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive (got {n_buckets})")
    order = [F.col(col)] + (
        [F.col(order_tiebreak)] if order_tiebreak else []
    )
    w = W.orderBy(*order)
    tiled = (
        df.filter(F.col(col).isNotNull())
        .withColumn("bucket", F.ntile(n_buckets).over(w))
    )
    return tiled.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(F.col(col).cast(f"decimal(38,{scale})"))
        .cast("string")
        .alias("min_val"),
        F.max(F.col(col).cast(f"decimal(38,{scale})"))
        .cast("string")
        .alias("max_val"),
    )


def table_checksum(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Order-independent content checksum of a relation — the
    cross-environment reconciliation primitive (did the migration /
    replication / backfill produce the SAME table?) that compares two
    warehouses with one number each, no row-level diff shuffle.

    Each row hashes to the portable 60-bit md5 of its pipe-joined
    PER-COLUMN md5 renderings: every column is cast to string and
    md5'd individually BEFORE joining, with NULL rendered as ``-``
    (one char, not hex — no md5 digest can collide with it). Because
    every joined token is a fixed-alphabet digest, a value containing
    ``|`` or the literal string ``NULL`` cannot inject a field
    boundary or impersonate the NULL sentinel — two distinct rows
    render identically only on an md5 collision, so the 1-in-2^60
    per-differing-row bound actually holds (the naive
    ``concat_ws('|', ...)`` rendering this replaced was
    delimiter-injectable). The checksum is the plain SUM of the row
    hashes in DECIMAL(38,0) — commutative, so partition order, engine,
    and parallelism cannot change it, and no 64-bit overflow at any
    row count. Returns (n_rows, checksum) with the checksum as a
    string.

    One map-side-combinable aggregate — a single row through the
    exchange at any table size. This is the cheap screen, the
    row-level tool is full_outer_reconcile.
    """
    if not cols:
        raise ValueError("table_checksum requires at least one column")
    from ..functions.hashing import portable_hash60

    rendered = F.concat_ws(
        "|",
        *[
            F.coalesce(
                F.md5(F.col(c).cast("string").cast("binary")), F.lit("-")
            )
            for c in cols
        ],
    )
    h = portable_hash60(rendered).cast("decimal(38,0)")
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(h).cast("string").alias("checksum"),
    )
