"""Self-contained demo project for the CLI — the reference pipeline in
one module.

Mirrors the reference project's full surface (models/staging/*.sql,
models/marts/fct_orders.sql, models/marts/schema.yml:7-19,
tests/assert_revenue_is_positive.sql:3-7) over synthetic demo seeds
shipped with the package (``models/demo_seeds/*.csv`` — hand-written
rows, NOT the Olist dataset), so

    python -m olist_snowflake_dbt_spark build

runs the same seed → views → mart → tests → gate flow the reference's
``automate_pipeline.py`` drives through the dbt CLI, with zero setup.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

SEED_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "demo_seeds")


def configure(engine) -> None:
    """Register the reference's models and test suite on ``engine``.
    Sources (the ``olist_*_dataset`` seeds) are ingested by the CLI's
    seed step; this only declares models + tests."""
    from .olist import register_olist_models

    register_olist_models(engine.registry)
    # schema.yml generic tests + the singular revenue test
    engine.test_unique("fct_orders", "order_id")
    engine.test_not_null("fct_orders", "order_id")
    engine.test_unique("stg_olist_customers", "customer_id")
    engine.test_not_null("stg_olist_customers", "customer_id")
    engine.test_relationships(
        "fct_orders", "customer_id", "stg_olist_customers", "customer_id"
    )
    engine.test_singular(
        "assert_revenue_is_positive",
        "fct_orders",
        lambda df: df.select("order_id", "total_order_value").filter(
            F.col("total_order_value") <= 0
        ),
    )
    # the project's selectors.yml analogue: a named, reusable selector
    # usable as `--selector marts` from the CLI
    engine.define_selector("marts", "fct_orders")
