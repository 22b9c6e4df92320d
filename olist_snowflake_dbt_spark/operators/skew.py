"""Skew mitigation operators.

AQE's skew-join splitting (on by default in session.py) handles most
skew at runtime, but two patterns are worth owning explicitly because
they change the SHUFFLE KEY, which AQE cannot:

- :func:`salted_join` — a hot probe-side key floods one reducer in a
  shuffle hash join. Salt the probe side into ``num_salts`` sub-keys
  and replicate the build side once per salt: the hot key's rows now
  land on ``num_salts`` reducers. Join RESULT is identical to the
  plain join — the salt only routes rows.
- :func:`two_phase_distinct` — COUNT(DISTINCT x) for a hot group first
  shuffles on (group, x) (splitting the hot group across reducers by
  x), dedupes, then shuffles the already-tiny distinct set on group.
  This is the rewrite Spark itself applies for single distinct aggs;
  owning it makes the plan explicit and composes with other aggs.

Salts are deterministic functions of row content (xxhash64-derived),
so retried tasks route identically — a requirement for exactly-once
sinks at scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with probe-side salting: probe rows get a deterministic
    salt in [0, num_salts); the build side is exploded once per salt so
    every (key, salt) pair finds its match. Use when one probe key
    dominates (power-law fact tables) and the build side is too big to
    broadcast; cost = build side × num_salts, usually tiny next to the
    skewed shuffle it replaces."""
    probe_cols = [c for c in probe.columns]
    build_cols = [c for c in build.columns if c != key]
    salted_probe = probe.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in probe_cols]), F.lit(num_salts)).cast("int"),
    )
    salted_build = build.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    out = salted_probe.join(salted_build, [key, "__salt"], how)
    return out.select(*probe_cols, *build_cols)


def two_phase_distinct(
    df: DataFrame, group_cols: Sequence[str], distinct_col: str
) -> DataFrame:
    """COUNT(DISTINCT distinct_col) per group, skew-proof: shuffle #1 on
    (group, value) splits any hot group across reducers; shuffle #2
    counts the deduped (and therefore bounded) set per group."""
    dedup = df.select(*group_cols, distinct_col).dropDuplicates(
        [*group_cols, distinct_col]
    )
    # count(col), not count(*): COUNT(DISTINCT x) never counts NULL, but
    # dropDuplicates keeps one NULL row per group. count(col) skips it
    # while still emitting all-NULL groups (with 0), matching SQL.
    return dedup.groupBy(*group_cols).agg(
        F.count(F.col(distinct_col)).alias(f"n_distinct_{distinct_col}")
    )


def key_skew_stats(
    df: DataFrame, key_cols: Sequence[str], top: int = 5
) -> DataFrame:
    """Shuffle-planning advisor: measure how skewed a prospective
    shuffle key is BEFORE paying for the shuffle it would route.

    Returns the ``top`` hottest key values with, per key: its row
    count, the total row count, the distinct-key count, the key's
    integer per-mille share of all rows, its hotness ratio vs a
    perfectly uniform key (count * distinct / total, rounded down),
    and the salt factor :func:`salted_join` would need to spread the
    hot key across reducers as evenly as the average key
    (= that same ratio, floored at 1).

    All outputs are integer-exact (cross-multiplied, no float), so an
    oracle reproduces every number. Cost: ONE map-side-combined
    aggregate over (key) + a top-k (TakeOrdered) — the same shape as a
    count census; the two scalar totals ride along via a broadcast
    1-row join. At 100 TB this is the cheap pre-flight that decides
    between a plain shuffle join, ``salted_join``, or a broadcast —
    the decision AQE makes reactively at runtime, made plannable.
    """
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("key_rows"))
    totals = counts.agg(
        F.sum("key_rows").cast("bigint").alias("total_rows"),
        F.count(F.lit(1)).cast("bigint").alias("distinct_keys"),
    )
    topk = (
        counts.orderBy(F.col("key_rows").desc(), *key_cols)
        .limit(top)
        .crossJoin(F.broadcast(totals))
    )
    # integer `div` throughout (floor semantics, verified identical to
    # DuckDB HUGEINT `//`); the product is widened through DECIMAL(38)
    # so 10^12 rows x 10^9 distinct keys cannot overflow a long
    hot = F.expr(
        "cast(cast(key_rows as decimal(19,0)) * distinct_keys "
        "div total_rows as bigint)"
    )
    return topk.select(
        *key_cols,
        F.col("key_rows").cast("bigint").alias("key_rows"),
        "total_rows",
        "distinct_keys",
        F.expr("key_rows * 1000 div total_rows").alias("share_per_mille"),
        hot.alias("hotness_ratio"),
        F.greatest(hot, F.lit(1)).cast("bigint").alias("recommended_salts"),
    )


# bytes-per-value model for fixed-width Spark SQL types (in-memory row
# estimate, matching the order of magnitude Spark's SizeEstimator and
# parquet column stats give for planning purposes)
_TYPE_BYTES = {
    "tinyint": 1,
    "smallint": 2,
    "int": 4,
    "bigint": 8,
    "float": 4,
    "double": 8,
    "boolean": 1,
    "date": 4,
    "timestamp": 8,
    "timestamp_ntz": 8,
}


def table_size_advice(
    tables: dict[str, "DataFrame"],
    broadcast_threshold_bytes: int = 10 * 1024 * 1024,
) -> "DataFrame":
    """Pre-flight join-strategy advisor: estimate each table's row count
    and in-memory width from its own data, and recommend ``broadcast``
    (fits under the autoBroadcastJoinThreshold-style cutoff) or
    ``shuffle`` — the sibling of :func:`key_skew_stats` for the OTHER
    join-planning decision a 100 TB run makes before paying a shuffle.

    Width model: fixed bytes per scalar type (see ``_TYPE_BYTES``),
    decimals at 16, strings/binaries at their measured mean byte length
    (integer ``floor(sum_bytes / n)`` per column — exact on any
    engine), arrays at mean element count × element width + 4. The
    estimate is ONE map-side-combinable aggregate per table — counts
    and byte sums — so advising costs a single scan of each candidate,
    and in practice runs on a sample or on parquet footer stats.

    Returns one row per table: ``(table_name, n_rows, est_row_bytes,
    est_total_bytes, strategy)``; all arithmetic integer-exact.
    """
    from pyspark.sql import functions as F

    out = None
    for name, df in tables.items():
        fixed = 0
        var_sums = []
        for col, dtype in df.dtypes:
            if dtype in _TYPE_BYTES:
                fixed += _TYPE_BYTES[dtype]
            elif dtype.startswith("decimal"):
                fixed += 16
            elif dtype in ("string", "binary"):
                var_sums.append(F.sum(F.octet_length(F.col(col))).alias(col))
            elif dtype.startswith("array<"):
                elem = dtype[len("array<"):-1]
                width = _TYPE_BYTES.get(elem, 8)
                fixed += 4
                var_sums.append((F.sum(F.size(F.col(col))) * width).alias(col))
            else:
                raise ValueError(
                    f"table_size_advice: no size model for {name}.{col}: {dtype}"
                )
        agg = df.agg(F.count(F.lit(1)).alias("__n"), *var_sums)
        n = F.greatest(F.col("__n"), F.lit(1))
        row_bytes = F.lit(fixed)
        for col in [c for c in agg.columns if c != "__n"]:
            row_bytes = row_bytes + F.floor(
                F.coalesce(F.col(col), F.lit(0)) / n
            ).cast("long")
        est = agg.select(
            F.lit(name).alias("table_name"),
            F.col("__n").alias("n_rows"),
            row_bytes.cast("long").alias("est_row_bytes"),
            (F.col("__n") * row_bytes).cast("long").alias("est_total_bytes"),
        ).withColumn(
            "strategy",
            F.when(
                F.col("est_total_bytes") <= broadcast_threshold_bytes,
                F.lit("broadcast"),
            ).otherwise(F.lit("shuffle")),
        )
        out = est if out is None else out.unionByName(est)
    if out is None:
        raise ValueError("table_size_advice: no tables given")
    return out
