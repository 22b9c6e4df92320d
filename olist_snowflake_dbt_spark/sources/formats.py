"""Interchange formats beyond the engine's native Parquet: JSON Lines,
ORC, and typed CSV — each with a writer and a schema-explicit reader.

Design rules for 100 TB:

- **Never infer schemas on read.** Inference scans data (JSON/CSV
  sample the whole file by default) and silently widens types between
  runs; every reader here requires the ``StructType`` up front, so a
  read is one footer/split plan, not a pre-pass. (The one sanctioned
  inferencer is the dbt-seed ingester in ``seeds.py``, whose agate
  precedence is itself the contract under test.)
- **Row formats are interchange, not storage.** JSONL/CSV scans are
  line-splittable and parallelize fine, but carry no column pruning,
  no predicate pushdown, no encodings; the engine's pattern is
  read-once → Parquet. ORC keeps columnar pruning/pushdown and exists
  for ecosystems standardized on it.
- **Sinks are directories of part files** (one per task — writers never
  funnel through a single reducer), partitioned by a key column where
  downstream reads filter on it (see :func:`write_partitioned_parquet`:
  partition pruning turns a date-range scan into a directory listing).

The reference ingests CSV seeds only (`$REF/seeds/*.csv`, loaded by
dbt's agate path — see sources/seeds.py); these formats are engine
extensions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON Lines sink: one JSON object per line, UTF-8, timestamps as
    ISO-8601 with explicit UTC offset so a schema'd read round-trips
    exactly regardless of reader timezone."""
    (
        df.write.mode(mode)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .json(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Schema-explicit JSONL read. PERMISSIVE mode with a corrupt-record
    column would hide bad rows; FAILFAST makes ingest errors loud, which
    is what a pipeline wants from its own round-trip format."""
    return (
        spark.read.schema(schema)
        .option("mode", "FAILFAST")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .json(path)
    )


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (zlib default): columnar with min/max stripe statistics —
    predicate pushdown and column pruning survive, same as Parquet."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC read — schema travels in the file footer (self-describing,
    no inference pass needed)."""
    return spark.read.orc(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV sink with the same dialect the seed reader accepts: header,
    RFC-4180 quote-doubling (escape == quote), empty string for NULL."""
    (
        df.write.mode(mode)
        .option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .csv(path)
    )


def read_csv_typed(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Typed CSV read: explicit schema, header skipped, empty → NULL,
    FAILFAST. The untyped/inferred path lives in seeds.py."""
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .option("nullValue", "")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .option("mode", "FAILFAST")
        .csv(path)
    )


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-layout partitioned Parquet sink (``path/col=value/part-*``).
    Reads that filter on a partition column scan only matching
    directories — at 100 TB this is THE difference between a full scan
    and touching one day of data. Keep partition cardinality bounded
    (dates, not user ids): each value is a directory and a task wave."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_parquet_merged(spark: SparkSession, *paths: str) -> DataFrame:
    """Schema-evolution read: union parquet file sets written at
    different schema epochs (columns added over time), reconciling by
    COLUMN NAME — rows from files that predate a column read as NULL.
    ``mergeSchema`` pays one footer pass over each file set at planning
    time; at 100 TB keep epochs coarse (per-ingest-generation
    directories) so the footer merge stays metadata-sized. Filters and
    pruning still push to every file: columns missing from a file are
    only materialized as NULL above the scan."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def scratch_dir(*parts: str) -> str:
    """Repo-local scratch root for sink round-trips (gitignored)."""
    base = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "spark-warehouse",
        "scratch",
    )
    return os.path.join(base, *parts)
