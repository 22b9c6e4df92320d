"""Driver queries for the Python UDF/UDAF/UDTF surface (functions/udfs)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import udfs as U
from .queries import _t, query


@query(
    "udtf_chunk_words",
    """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    SELECT doc_id, idx AS chunk_idx,
           array_to_string(ws[(idx-1)*8+1 : (idx-1)*8+8], ' ') AS chunk,
           len(ws[(idx-1)*8+1 : (idx-1)*8+8]) AS n_words
    FROM (
        SELECT doc_id, ws,
               UNNEST(generate_series(1, CAST(ceil(len(ws) / 8.0) AS BIGINT))) AS idx
        FROM w
    )
    """,
)
def q_udtf_chunk_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF via LATERAL join: per-document 8-word chunk fan-out
    (context-window packing shape) with 1-based positions; the oracle is
    the pure-SQL list-slice twin, so the UDTF row-generation contract
    itself is what hash-matches."""
    U.register_udfs(spark)
    _t(spark, sf_dir, "documents").createOrReplaceTempView("__docs_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, s.chunk_idx, s.chunk, s.n_words
        FROM __docs_udtf d, LATERAL chunk_words(d.text) s
        """
    )


@query(
    "udaf_decimal_sum",
    """
    SELECT o_orderpriority,
           CAST(CAST(SUM(CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(18,2)))
                     AS DECIMAL(38,2)) AS DOUBLE) AS total_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_udaf_decimal_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg Pandas UDF (AggregateInPandas): exact decimal sum per
    priority, bit-identical to the SQL SUM oracle via shortest-repr
    parsing on both sides; final presentation cast to DOUBLE (driver
    repr parity — see queries.py header)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        U.decimal_sum_agg(F.col("o_totalprice")).cast("double").alias("total_price")
    )


@query(
    "udf_compression_ratio",
    """
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS byte_len,
           CAST(len(list_distinct(string_split(text, ''))) AS BIGINT)
               AS n_distinct_chars,
           TRUE AS ratio_in_bounds
    FROM documents
    """,
)
def q_udf_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Pandas UDF: deflate-ratio quality signal per document
    (entropy proxy — template spam compresses far below prose). zlib
    has no SQL twin, so the driver-checked output is (a) exact
    byte-length/distinct-char stats both engines compute and (b) a
    bounds invariant over the REAL zlib ratio (0 < r < 2 — deflate's
    worst-case expansion on these >=48-byte docs is far under 2x),
    which the oracle states as literal TRUE; the ratio's monotonicity /
    exact values stay pytest-asserted (tests/test_udfs.py)."""
    d = _t(spark, sf_dir, "documents")
    r = U.compression_ratio(F.col("text"))
    return d.select(
        "doc_id",
        F.octet_length("text").cast("bigint").alias("byte_len"),
        F.size(F.array_distinct(F.split(F.col("text"), "")))
        .cast("bigint")
        .alias("n_distinct_chars"),
        ((r > F.lit(0.0)) & (r < F.lit(2.0))).alias("ratio_in_bounds"),
    )


@query(
    "udtf_polymorphic_parse",
    """
    SELECT o_orderkey,
           split_part(o_orderpriority, '-', 1) AS code,
           split_part(o_orderpriority, '-', 2) AS name
    FROM orders WHERE o_orderkey % 32 = 0
    """,
)
def q_udtf_polymorphic_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (PySpark 4 ``analyze()``): the output
    schema (code, name) is not declared at registration — analyze()
    derives it on the driver from the constant ``'code,name'`` argument
    at plan time (AnalyzeResult contract), then eval() streams splits on
    executors via LATERAL fan-out. The oracle is the split_part twin, so
    the dynamic-schema plumbing (column naming, order, NULL fill) is
    exactly what hash-matches."""
    U.register_udfs(spark)
    _t(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 32 == 0
    ).createOrReplaceTempView("__orders_udtf")
    return spark.sql(
        """
        SELECT o.o_orderkey, p.code, p.name
        FROM __orders_udtf o,
        LATERAL parse_delimited(o.o_orderpriority, '-', 'code,name') p
        """
    )
