"""Driver queries for the materialization layer (plans/materialize.py):
the A17/A18 table path and the B3 dynamic table, each verified end to
end — the oracle checks the rows a consumer READS BACK from the
materialized relation, so the write/publish/read cycle itself is inside
the correctness gate, not just the SELECT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .plans.materialize import DynamicTable, clone_table, materialize_table
from .queries import _FCT_ORDERS_ORACLE, QUERIES, _t, query
from .sources import formats as FMT


@query("materialize_table_roundtrip", _FCT_ORDERS_ORACLE)
def q_materialize_table_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A17/A18: the flagship model materialized as a TABLE (parquet CTAS
    with atomic rename-swap publish, plans/materialize.materialize_table)
    and read back from the published files — hash-matching the fct_orders
    oracle proves the full write→swap→read cycle is lossless for every
    column type the model emits (longs, strings, timestamps, doubles)."""
    fct = QUERIES["fct_orders"](spark, sf_dir)
    warehouse = FMT.scratch_dir("materialize", "warehouse")
    rel = materialize_table(spark, "fct_orders_tbl", fct, warehouse)
    return rel.df


@query("clone_zero_copy", _FCT_ORDERS_ORACLE)
def q_clone_zero_copy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4: zero-copy clone of the materialized flagship table (hardlinked
    parquet files, plans/materialize.clone_table) read back and verified
    against the SOURCE's oracle — the clone serves identical rows while
    sharing every data byte with the original (inode identity asserted
    in tests/test_runner.py)."""
    import shutil

    fct = QUERIES["fct_orders"](spark, sf_dir)
    warehouse = FMT.scratch_dir("materialize", "warehouse")
    rel = materialize_table(spark, "fct_orders_clone_src", fct, warehouse)
    dst = FMT.scratch_dir("materialize", "warehouse", "fct_orders_cloned")
    shutil.rmtree(dst, ignore_errors=True)
    clone_table(rel.path, dst)
    return spark.read.parquet(dst)


@query(
    "zorder_roundtrip",
    """
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
                AS DOUBLE) AS sum_total
    FROM orders
    WHERE o_orderkey BETWEEN 1000 AND 5000 AND o_totalprice < 150000
    GROUP BY o_orderstatus
    """,
)
def q_zorder_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustered materialization read back through a TWO-column
    predicate (the workload the Morton layout exists for): the
    aggregate over the re-read files must equal the oracle computed on
    the source — proving the interleaved-bucket rewrite is lossless.
    File-level skipping on both dimensions is asserted from parquet
    footers in tests/test_formats.py."""
    from .plans.materialize import materialize_zorder_table
    from .queries import _t

    orders = _t(spark, sf_dir, "orders")
    warehouse = FMT.scratch_dir("materialize", "warehouse")
    rel = materialize_zorder_table(
        spark, "orders_zorder", orders, warehouse,
        ["o_orderkey", "o_totalprice"], num_files=8,
    )
    return (
        rel.df.filter(
            F.col("o_orderkey").between(1000, 5000)
            & (F.col("o_totalprice") < 150000)
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .cast("double")
            .alias("sum_total"),
        )
    )


@query(
    "dynamic_table_refresh",
    """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2))
                AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def q_dynamic_table_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3 dynamic table: an hourly windowed aggregation over the events
    stream kept fresh by foreachBatch MERGE refreshes. Two full
    refreshes run — first over the pre-Jan-5 prefix, then over the whole
    source — so the second genuinely UPSERTS every stale key (same
    window re-aggregated over more data) rather than only inserting; the
    final read-back must equal the batch GROUP BY over all events, which
    is exactly what the oracle computes."""
    import shutil

    from .streaming import stream_events, windowed_event_counts

    path = FMT.scratch_dir("dynamic_table", "hourly_counts")
    # merge keeps keys absent from the refresh batch, so a stale table
    # from an earlier run (different sf) would leak rows — start clean
    shutil.rmtree(path, ignore_errors=True)
    dt = DynamicTable(spark, path, ["window_start", "event_type"])

    def agg(stream: DataFrame) -> DataFrame:
        counts = windowed_event_counts(stream, "1 hour", watermark="30 minutes")
        return counts.withColumn(
            "total_value", F.col("total_value").cast("double")
        )

    ev = stream_events(spark, sf_dir)
    dt.refresh(agg(ev.filter(F.col("ts") < F.lit("2024-01-05").cast("timestamp"))))
    dt.refresh(agg(ev))
    return dt.read()


@query(
    "multi_table_insert_routes",
    """
    SELECT 'orders_high' AS target_table, COUNT(*) AS n_rows,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
                AS DOUBLE) AS sum_total
    FROM orders WHERE o_totalprice >= 200000
    UNION ALL
    SELECT 'orders_mid', COUNT(*),
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
                AS DOUBLE)
    FROM orders WHERE o_totalprice >= 50000 AND o_totalprice < 200000
    UNION ALL
    SELECT 'orders_low', COUNT(*),
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
                AS DOUBLE)
    FROM orders WHERE o_totalprice < 50000
    """,
)
def q_multi_table_insert_routes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake INSERT FIRST / multi-table insert (plans/materialize.
    multi_table_insert): orders fan into high/mid/low-value tables in
    ONE pass — rows are tagged with their first matching route and
    written once, partitioned by the tag (each task splits its stream
    into per-route files; no shuffle, no per-target re-scan), then each
    route directory promotes atomically to its table. The result here
    re-READS the three published tables and aggregates them, so the
    oracle match proves the whole route->write->promote->read cycle,
    including first-match precedence at the band boundaries."""
    o = _t(spark, sf_dir, "orders")
    warehouse = FMT.scratch_dir("materialize", "mti_warehouse")
    routes = {
        "orders_high": F.col("o_totalprice") >= 200000,
        "orders_mid": F.col("o_totalprice") >= 50000,
        "orders_low": F.lit(True),
    }
    from .plans.materialize import multi_table_insert

    rels = multi_table_insert(spark, o, "__route", routes, warehouse)
    parts = []
    for name, rel in rels.items():
        parts.append(
            rel.df.agg(
                F.lit(name).alias("target_table"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("decimal(38,2)")
                .cast("double")
                .alias("sum_total"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@query(
    "result_cache_roundtrip",
    """
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
                AS DOUBLE) AS sum_total
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_result_cache_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake result-cache analogue (plans/result_cache.ResultCache):
    the same aggregate plan requested twice through the cache — the
    first call computes and publishes (tmp-dir + atomic rename), the
    second is served as a parquet read of the stored result keyed by
    the analyzed-plan fingerprint (semanticHash + schema digest). The
    returned frame is the CACHED read, so the oracle match proves a
    cache hit serves exactly what the computation would have — and the
    path-keyed staleness contract is safe here because testdata tables
    are immutable paths (generation-published tables get new paths,
    hence new keys, automatically)."""
    from .plans.result_cache import ResultCache

    o = _t(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .cast("double")
        .alias("sum_total"),
    )
    cache = ResultCache(spark, FMT.scratch_dir("result_cache"))
    cache.get_or_compute(agg)  # compute + publish
    served, _hit = cache.get_or_compute(agg)  # served from cache
    return served


_COMPACT_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(64 AS BIGINT) AS n_files_before,
       CAST(1 AS BIGINT) AS n_files_after,
       TRUE AS rows_conserved
FROM events
GROUP BY 1
"""


@query("layout_compaction_roundtrip", _COMPACT_ORACLE)
def q_layout_compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file COMPACTION (plans/materialize.compact_table) — THE
    recurring maintenance job of a lakehouse fed by streaming and
    incremental writers: the events table is first written as 64
    deliberately tiny files (the pathology), compacted into
    ceil(bytes/target)=1 evenly-sized file via round-robin repartition
    + atomic swap, and read back. File counts before/after are measured
    from the actual directory (input_file_name cardinality), the row
    multiset must be conserved across the rewrite, and the aggregate of
    the POST-compaction read must hash-match the oracle computed from
    the original table — the whole fragment → compact → publish → read
    cycle sits inside the correctness gate."""
    import shutil as _sh

    from .plans.materialize import compact_table

    ev = _t(spark, sf_dir, "events")
    path = FMT.scratch_dir("compaction", "events_small_files")
    _sh.rmtree(path, ignore_errors=True)
    ev.repartition(64).write.mode("overwrite").parquet(path)

    before = spark.read.parquet(path)
    n_before = (
        before.select(F.input_file_name().alias("__f"))
        .dropDuplicates()
        .count()
    )
    rows_before = before.count()

    n_after_files = compact_table(spark, path, target_file_bytes=1 << 30)
    after = spark.read.parquet(path)
    n_after = (
        after.select(F.input_file_name().alias("__f")).dropDuplicates().count()
    )
    if n_after != n_after_files:
        raise AssertionError(f"directory says {n_after_files} files, scan saw {n_after}")
    conserved = after.count() == rows_before
    return after.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.lit(n_before).cast("bigint").alias("n_files_before"),
        F.lit(n_after).cast("bigint").alias("n_files_after"),
        F.lit(conserved).alias("rows_conserved"),
    )
