from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

# importing the package runs compat.export_protobuf_env() — the
# PYTHONPATH export for transformWithState's driver-side Python worker
# must precede the JVM launch in the spark fixture below
from olist_snowflake_dbt_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest", **{"spark.sql.shuffle.partitions": "4"})
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
