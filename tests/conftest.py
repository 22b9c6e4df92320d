from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from olist_snowflake_dbt_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest", **{"spark.sql.shuffle.partitions": "4"})
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
