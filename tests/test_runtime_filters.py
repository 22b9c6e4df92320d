"""Runtime-filter scale features the session enables for 100 TB scans:
dynamic partition pruning (a filtered dim join prunes the fact table's
partition directories at runtime) and runtime bloom-filter injection
(a selective dim filter becomes a might_contain pre-filter on the fact
side of a shuffle join). Both are plan-shape pins — if a Spark upgrade
or a session-conf change silently turns them off, these fail."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def test_dynamic_partition_pruning_injected(spark, tmp_path):
    fact_path = str(tmp_path / "fact")
    spark.range(0, 50000).withColumn(
        "day", (F.col("id") % 30).cast("int")
    ).write.partitionBy("day").parquet(fact_path)
    fact = spark.read.parquet(fact_path)
    dim = (
        spark.range(0, 30)
        .withColumn("day", F.col("id").cast("int"))
        .filter(F.col("day") < 3)
        .select("day")
    )
    j = fact.join(dim.hint("broadcast"), "day")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    # the pruned scan must really skip partitions: only 3 of 30 days
    assert j.count() == fact.filter(F.col("day") < 3).count()


def test_runtime_bloom_filter_injected(spark, tmp_path):
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        fact_path, dim_path = str(tmp_path / "f"), str(tmp_path / "d")
        spark.range(0, 100000).withColumn("k", F.col("id") % 1000).write.parquet(
            fact_path
        )
        spark.range(0, 1000).withColumn("k", F.col("id")).write.parquet(dim_path)
        fact = spark.read.parquet(fact_path)
        dim = spark.read.parquet(dim_path).filter(F.col("id") < 10)
        j = fact.join(dim, "k")
        opt = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in opt and "bloom_filter_agg" in opt
        assert j.count() == 100000 // 1000 * 10
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
