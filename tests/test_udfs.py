"""Python UDF/UDAF/UDTF surface (functions/udfs.py)."""

from __future__ import annotations

import decimal

from pyspark.sql import functions as F

from olist_snowflake_dbt_spark.functions import udfs as U


def test_compression_ratio_orders_by_entropy(spark):
    df = spark.createDataFrame(
        [
            (1, "spam " * 200),               # pure repetition
            (2, "the quick brown fox jumps over the lazy dog " * 20),
            (3, None),
            (4, ""),
        ],
        "id long, text string",
    )
    got = {r["id"]: r["r"] for r in
           df.select("id", U.compression_ratio("text").alias("r")).collect()}
    assert got[3] is None and got[4] is None
    assert 0 < got[1] < got[2] < 1  # repetition compresses far better


def test_decimal_sum_agg_skips_nulls_and_is_exact(spark):
    df = spark.createDataFrame(
        [("a", 0.1), ("a", 0.2), ("a", None), ("b", 1234567.89)],
        "k string, v double",
    )
    got = {r["k"]: r["s"] for r in
           df.groupBy("k").agg(U.decimal_sum_agg("v").alias("s")).collect()}
    # 0.1 + 0.2 exactly, not 0.30000000000000004
    assert got["a"] == decimal.Decimal("0.30")
    assert got["b"] == decimal.Decimal("1234567.89")


def test_chunk_words_udtf_fanout_and_nulls(spark):
    U.register_udfs(spark)
    spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "solo"), (3, None)],
        "doc_id long, text string",
    ).createOrReplaceTempView("__t_udtf")
    rows = spark.sql(
        "SELECT doc_id, s.* FROM __t_udtf d, LATERAL chunk_words(d.text) s"
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 2          # 10 words -> chunks of 8 + 2
    assert by_doc[1][0]["n_words"] == 8 and by_doc[1][1]["n_words"] == 2
    assert [r["chunk_idx"] for r in sorted(by_doc[1], key=lambda r: r["chunk_idx"])] == [1, 2]
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk"] == "solo"
    assert 3 not in by_doc              # NULL text -> no rows


def test_polymorphic_udtf_schema_follows_fields_arg(spark):
    """analyze() must derive different schemas from different constant
    args, NULL-fill missing parts, and drop NULL-input rows."""
    from olist_snowflake_dbt_spark.functions.udfs import register_udfs

    register_udfs(spark)
    wide = spark.sql("SELECT * FROM parse_delimited('a|b', '|', 'x,y,z')")
    assert wide.columns == ["x", "y", "z"]
    row = wide.collect()[0]
    assert (row.x, row.y, row.z) == ("a", "b", None)
    narrow = spark.sql("SELECT * FROM parse_delimited('a|b', '|', 'only')")
    assert narrow.columns == ["only"] and narrow.collect()[0].only == "a"
    none = spark.sql(
        "SELECT * FROM VALUES (CAST(NULL AS STRING)) t(s), "
        "LATERAL parse_delimited(t.s, '|', 'x') p"
    )
    assert none.count() == 0


def test_map_in_arrow_surface(spark):
    """PySpark 4 mapInArrow: the Arrow-native batch lane (RecordBatch in,
    RecordBatch out) — the zero-copy sibling of mapInPandas used by the
    multimodal kernels. Verifies batch shape and arithmetic parity."""
    import pyarrow as pa

    df = spark.range(100).withColumn("v", (F.col("id") % 7).cast("long"))

    def double_v(batches):
        for b in batches:
            yield pa.RecordBatch.from_arrays(
                [b.column("id"), pa.compute.multiply(b.column("v"), 2)],
                names=["id", "v2"],
            )

    out = df.mapInArrow(double_v, "id long, v2 long")
    rows = {r.id: r.v2 for r in out.collect()}
    assert rows == {i: (i % 7) * 2 for i in range(100)}
