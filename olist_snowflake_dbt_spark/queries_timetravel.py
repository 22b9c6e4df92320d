"""Driver queries for table versioning (plans/timetravel.py): Snowflake
time travel (``AT(OFFSET => -1)``) and STREAMS/CHANGES semantics over the
parquet warehouse.

The reference project runs on Snowflake, where dbt snapshots and CDC
consumers lean on the warehouse's built-in version history
(``$DBT_PROJECT/snapshots`` would use it implicitly; Snowflake docs:
Time Travel / Streams). Here both generations are PUBLISHED through
:class:`plans.timetravel.VersionedTable` (two-phase manifest commit),
the old generation is read back via ``offset=-1`` time travel, and the
delta between versions is computed by :func:`plans.timetravel.
table_changes` — so the driver row verifies the whole publish → manifest
→ time-travel-read → changes cycle, not just the join.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .plans.timetravel import TableStream, VersionedTable, table_changes
from .queries import query
from .sources import formats as FMT
from .sources.readers import read_table

# Deterministic synthetic churn over the customer table:
#   v1 (old) = every customer except c_custkey % 7 == 0
#   v2 (new) = every customer except c_custkey % 3 == 0, with the market
#              segment rewritten to 'UPDATED' where c_custkey % 5 == 0
# so INSERTs are the (%7==0, %3!=0) keys, DELETEs the (%3==0, %7!=0)
# keys, and UPDATEs the (%5==0) keys present in both versions.
_TT_CHANGES_ORACLE = """
WITH old AS (
    SELECT c_custkey, c_name, c_mktsegment, c_acctbal
    FROM customer WHERE c_custkey % 7 <> 0
),
new AS (
    SELECT c_custkey, c_name,
           CASE WHEN c_custkey % 5 = 0 THEN 'UPDATED' ELSE c_mktsegment END
               AS c_mktsegment,
           c_acctbal
    FROM customer WHERE c_custkey % 3 <> 0
),
j AS (
    SELECT o.c_custkey AS o_key, n.c_custkey AS n_key,
           o.c_name AS o_name, o.c_mktsegment AS o_seg, o.c_acctbal AS o_bal,
           n.c_name AS n_name, n.c_mktsegment AS n_seg, n.c_acctbal AS n_bal
    FROM old o FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey
    WHERE o.c_custkey IS NULL OR n.c_custkey IS NULL
       OR o.c_name IS DISTINCT FROM n.c_name
       OR o.c_mktsegment IS DISTINCT FROM n.c_mktsegment
       OR o.c_acctbal IS DISTINCT FROM n.c_acctbal
)
SELECT o_key AS c_custkey, o_name AS c_name, o_seg AS c_mktsegment,
       o_bal AS c_acctbal, 'DELETE' AS metadata_action,
       (o_key IS NOT NULL AND n_key IS NOT NULL) AS metadata_isupdate
FROM j WHERE o_key IS NOT NULL
UNION ALL
SELECT n_key, n_name, n_seg, n_bal, 'INSERT',
       (o_key IS NOT NULL AND n_key IS NOT NULL)
FROM j WHERE n_key IS NOT NULL
"""


def _versions(spark: SparkSession, sf_dir: str):
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal"
    )
    old = cust.filter(F.col("c_custkey") % 7 != 0)
    new = cust.filter(F.col("c_custkey") % 3 != 0).withColumn(
        "c_mktsegment",
        F.when(F.col("c_custkey") % 5 == 0, F.lit("UPDATED")).otherwise(
            F.col("c_mktsegment")
        ),
    )
    return old, new


@query("timetravel_changes", _TT_CHANGES_ORACLE)
def q_timetravel_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake CHANGES between two published table generations
    (plans/timetravel.py): v1 and v2 of a churned customer table are
    PUBLISHED through VersionedTable (tmp-dir write → atomic rename →
    manifest commit), v1 is read back via time travel ``offset=-1``, v2
    via the current pointer, and the delta comes from ONE full-outer
    hash join on the key comparing 8-byte xxhash64 row fingerprints —
    unchanged keys are dropped BEFORE the DELETE/INSERT fan-out, so the
    output (and everything downstream of a stream) is proportional to
    the churn, not the table. Updates surface as Snowflake does them: a
    DELETE+INSERT pair with metadata_isupdate = true."""
    old, new = _versions(spark, sf_dir)
    root = FMT.scratch_dir("timetravel")
    shutil.rmtree(root, ignore_errors=True)  # idempotent across runs
    vt = VersionedTable(spark, root, "customer_churn")
    vt.publish(old)
    vt.publish(new)
    return table_changes(vt.read(offset=-1), vt.read(), ["c_custkey"])


# v3 churn on top of v2: drop the c_custkey % 11 == 0 keys, promote the
# % 13 == 0 keys to segment 'VIP'.
_TT_STREAM_ORACLE = """
WITH v2 AS (
    SELECT c_custkey, c_name,
           CASE WHEN c_custkey % 5 = 0 THEN 'UPDATED' ELSE c_mktsegment END
               AS c_mktsegment,
           c_acctbal
    FROM customer WHERE c_custkey % 3 <> 0
),
v3 AS (
    SELECT c_custkey, c_name,
           CASE WHEN c_custkey % 13 = 0 THEN 'VIP' ELSE c_mktsegment END
               AS c_mktsegment,
           c_acctbal
    FROM v2 WHERE c_custkey % 11 <> 0
),
j AS (
    SELECT o.c_custkey AS o_key, n.c_custkey AS n_key,
           o.c_name AS o_name, o.c_mktsegment AS o_seg, o.c_acctbal AS o_bal,
           n.c_name AS n_name, n.c_mktsegment AS n_seg, n.c_acctbal AS n_bal
    FROM v2 o FULL OUTER JOIN v3 n ON o.c_custkey = n.c_custkey
    WHERE o.c_custkey IS NULL OR n.c_custkey IS NULL
       OR o.c_name IS DISTINCT FROM n.c_name
       OR o.c_mktsegment IS DISTINCT FROM n.c_mktsegment
       OR o.c_acctbal IS DISTINCT FROM n.c_acctbal
)
SELECT o_key AS c_custkey, o_name AS c_name, o_seg AS c_mktsegment,
       o_bal AS c_acctbal, 'DELETE' AS metadata_action,
       (o_key IS NOT NULL AND n_key IS NOT NULL) AS metadata_isupdate
FROM j WHERE o_key IS NOT NULL
UNION ALL
SELECT n_key, n_name, n_seg, n_bal, 'INSERT',
       (o_key IS NOT NULL AND n_key IS NOT NULL)
FROM j WHERE n_key IS NOT NULL
"""


@query("timetravel_stream_consume", _TT_STREAM_ORACLE)
def q_timetravel_stream_consume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake STREAM consumption offsets (plans/timetravel.TableStream):
    a stream created at v1 sees the v1->v2 delta; after the consumer
    ADVANCES (the transactional offset commit), publishing v3 makes the
    stream read ONLY the v2->v3 delta — returned here, so the oracle
    match proves the offset actually moved and the second read is
    incremental, not cumulative. The offset is one integer next to the
    manifest (O(1) bytes per stream at any table size); each read is the
    single fingerprint-compare join of table_changes between the two
    retained generations."""
    old, new = _versions(spark, sf_dir)
    v3 = new.filter(F.col("c_custkey") % 11 != 0).withColumn(
        "c_mktsegment",
        F.when(F.col("c_custkey") % 13 == 0, F.lit("VIP")).otherwise(
            F.col("c_mktsegment")
        ),
    )
    root = FMT.scratch_dir("timetravel_stream")
    shutil.rmtree(root, ignore_errors=True)  # idempotent across runs
    vt = VersionedTable(spark, root, "customer_churn")
    vt.publish(old)
    stream = TableStream(vt, "consumer_a", ["c_custkey"])
    vt.publish(new)
    stream.read()  # pending v1->v2 delta ...
    stream.advance()  # ... consumed
    vt.publish(v3)
    return stream.read()  # v2->v3 only


_IVM_ORACLE = """
WITH v2 AS (
    SELECT o_orderstatus,
           CAST(CASE WHEN o_orderkey % 7 = 0
                     THEN CAST(o_totalprice AS DECIMAL(18,2)) + 100
                     ELSE CAST(o_totalprice AS DECIMAL(18,2)) END
                AS DECIMAL(18,2)) AS price
    FROM orders WHERE o_orderkey % 3 <> 0 AND o_orderkey % 5 <> 0
)
SELECT o_orderstatus, COUNT(*) AS n_rows,
       CAST(CAST(SUM(price) AS DECIMAL(38,2)) AS DOUBLE) AS sum_total
FROM v2 GROUP BY 1
"""


@query("timetravel_ivm_refresh", _IVM_ORACLE)
def q_timetravel_ivm_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance over a CHANGES delta
    (operators/incremental.ivm_apply_changes — the algebra inside
    Snowflake's incremental dynamic-table refresh): a standing
    count/sum aggregate built over orders v1 is ADVANCED using only the
    v1->v2 delta from table_changes (deletes of the %5 keys, repricing
    of the %7 keys as DELETE+INSERT pairs) — the base table is never
    re-aggregated. The oracle recomputes the aggregate directly over
    v2, so the hash match proves maintained == recomputed exactly
    (DECIMAL sums make maintenance order-independent). Refresh cost is
    O(churned groups), the property that makes a 100 TB dynamic table
    affordable to keep fresh."""
    from .operators.incremental import ivm_apply_changes

    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    v1 = o.filter(F.col("o_orderkey") % 3 != 0)
    v2 = v1.filter(F.col("o_orderkey") % 5 != 0).withColumn(
        "price",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("price") + 100
        ).otherwise(F.col("price")).cast("decimal(18,2)"),
    )
    agg1 = v1.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("price").cast("decimal(38,2)").alias("sum_total"),
    )
    changes = table_changes(v1, v2, ["o_orderkey"])
    maintained = ivm_apply_changes(
        agg1,
        changes,
        ["o_orderstatus"],
        count_col="n_rows",
        sum_cols={"sum_total": "price"},
    )
    return maintained.select(
        "o_orderstatus",
        "n_rows",
        F.col("sum_total").cast("double").alias("sum_total"),
    )


@query(
    "timetravel_schema_drift",
    """
    SELECT * FROM (VALUES
        ('c_acctbal', 'removed', 'double', NULL),
        ('c_segment_code', 'added', NULL, 'string'),
        ('c_nationkey', 'type_changed', 'int', 'bigint')
    ) AS t(column_name, change, old_type, new_type)
    """,
)
def q_timetravel_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift report between two published generations
    (operators/profiling.schema_drift): v2 of a customer projection
    drops c_acctbal, adds c_segment_code, and widens c_nationkey int ->
    bigint; the report flags exactly those three (renames/reorders of
    untouched columns are not drift). Metadata-only — no job runs, so
    the gate costs the same at 100 TB as at sf0.01; it is the check a
    consumer runs against a VersionedTable generation before trusting
    it, and the observability twin of runner.py's enforced model
    contracts."""
    from .operators.profiling import schema_drift

    cust = read_table(spark, sf_dir, "customer")
    v1 = cust.select("c_custkey", "c_name", "c_nationkey", "c_acctbal",
                     "c_mktsegment")
    v2 = cust.select(
        "c_custkey",
        "c_name",
        F.col("c_nationkey").cast("bigint").alias("c_nationkey"),
        "c_mktsegment",
        F.upper("c_mktsegment").alias("c_segment_code"),
    )
    return schema_drift(v1, v2).withColumnRenamed("column", "column_name")
