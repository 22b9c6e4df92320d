from __future__ import annotations

from pyspark.sql import functions as F

from olist_snowflake_dbt_spark.plans.materialize import materialize_bucketed_table
from olist_snowflake_dbt_spark.sources.readers import read_table


def test_cobucketed_join_has_no_shuffle(spark, sf_dir, tmp_path_factory):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = read_table(spark, sf_dir, "orders")
        li = read_table(spark, sf_dir, "lineitem")
        materialize_bucketed_table(
            spark, "b_orders", orders, ["o_orderkey"], num_buckets=8
        )
        materialize_bucketed_table(
            spark,
            "b_lineitem",
            li.withColumnRenamed("l_orderkey", "o_orderkey"),
            ["o_orderkey"],
            num_buckets=8,
        )
        joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-bucketed + same bucket count -> sort-merge join with ZERO
        # exchanges; the bucketing IS the partitioning
        assert "Exchange" not in plan
        assert joined.count() == li.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_groupby_has_no_shuffle(spark, sf_dir):
    try:
        li = read_table(spark, sf_dir, "lineitem")
        materialize_bucketed_table(
            spark, "b_li_agg", li, ["l_orderkey"], num_buckets=8
        )
        agg = (
            spark.table("b_li_agg")
            .groupBy("l_orderkey")
            .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert agg.count() == li.select("l_orderkey").distinct().count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_li_agg")


def test_partition_pruning_reaches_scan(spark, sf_dir, tmp_path):
    """Writing date-partitioned parquet and filtering on the partition
    column must prune at the file-listing level (PartitionFilters), not
    post-scan."""
    from pyspark.sql import functions as F2

    ev = read_table(spark, sf_dir, "events").withColumn("day", F2.to_date("ts"))
    path = str(tmp_path / "events_by_day")
    ev.write.mode("overwrite").partitionBy("day").parquet(path)
    pruned = spark.read.parquet(path).filter(F2.col("day") == "2024-01-03")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(day" in plan
    # only the matching partition's rows are read
    expected = ev.filter(F2.col("day") == "2024-01-03").count()
    assert pruned.count() == expected
