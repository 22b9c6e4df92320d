"""``python -m olist_snowflake_dbt_spark`` — the CLI entry point
(reference: automate_pipeline.py drives dbt's CLI the same way)."""

import sys

from .cli import main

sys.exit(main())
