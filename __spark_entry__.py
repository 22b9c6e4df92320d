"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship fct_orders pipeline analogue at sf0.001.
``queries()`` / ``oracle_sql()`` expose one entry per implemented operator
from SURVEY.md §2 (+ the LLM-pipeline extensions), checked by the driver
against DuckDB at sf0.01.

Determinism policy for the oracle compare: money/aggregate math is routed
through DECIMAL on BOTH sides (exact, order-independent — double summation
would drift in the last ulp between engines); every computed column is
aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from olist_snowflake_dbt_spark.queries import QUERIES, ORACLE_SQL


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.
    Routed through the registered query so entry() and the oracle-checked
    fct_orders share one code path (incl. the DOUBLE presentation casts)."""
    return QUERIES["fct_orders"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator; (spark, sf_dir) -> DataFrame."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per queries() key (omitted ⇒ rows-only)."""
    return dict(ORACLE_SQL)
