"""Readers for the driver's TPC-H-ish parquet testdata and generic tables.

Parquet is the engine's native storage: columnar, predicate-pushdown and
column-pruned by Catalyst (check with ``.explain`` → PushedFilters /
ReadSchema). At 100 TB these reads partition by file-split automatically;
``spark.sql.files.maxPartitionBytes`` governs split size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_testdata_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view; returns the DataFrames."""
    out = {}
    for name in TESTDATA_TABLES:
        df = read_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
