"""olist_snowflake_dbt_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the
``zach-gitere/olist-snowflake-dbt`` reference (a dbt-on-Snowflake Medallion
ELT pipeline) as an idiomatic Spark engine:

- :mod:`.sources`     — seed (CSV) ingestion with dbt-agate-equivalent type
                        inference, plus parquet/json readers.
- :mod:`.plans`       — the model registry: named models linked by ``ref()``
                        into a DAG, topologically executed, materialized as
                        temp views (Silver) or Parquet tables (Gold).
- :mod:`.operators`   — data-quality tests (unique / not_null / relationships /
                        accepted_values / singular), incremental strategies,
                        SCD-2 snapshots, and the LLM-data-pipeline extensions
                        (dedup, similarity search, text analysis, multimodal).
- :mod:`.functions`   — column-level helpers (vector math, hashing, text).
- :mod:`.streaming`   — Structured Streaming equivalents for event data.
- :mod:`.models`      — the reference's Olist models and their TPC-H-style
                        analogues used by the driver harness.
- :mod:`.runner`      — dbt-style ``seed`` / ``run`` / ``test`` orchestration
                        with pass/fail gating (reference:
                        automate_pipeline.py:10-26).

Everything is DataFrame/Spark-SQL first: Catalyst handles pushdown, pruning
and join strategy; AQE handles shuffle sizing and skew at scale.
"""

__version__ = "0.1.0"

# Optional-dependency wiring must precede JVM launch (PYTHONPATH is
# frozen into the JVM environment at gateway start) — see compat.py.
from .compat import export_protobuf_env as _export_protobuf_env

_export_protobuf_env()
