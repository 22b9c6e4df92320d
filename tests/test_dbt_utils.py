"""Tests for the dbt-utils essentials (functions/dbt_utils.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from olist_snowflake_dbt_spark.functions.dbt_utils import (
    NULL_SENTINEL,
    at_least_one,
    equal_rowcount,
    expression_is_true,
    generate_surrogate_key,
    union_relations,
)


def test_surrogate_key_matches_dbt_utils_algorithm(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None)], "id long, name string"
    )
    got = {
        r.id: r.k
        for r in df.select(
            "id", generate_surrogate_key(["id", "name"]).alias("k")
        ).collect()
    }
    assert got[1] == hashlib.md5(b"1-a").hexdigest()
    assert got[2] == hashlib.md5(f"2-{NULL_SENTINEL}".encode()).hexdigest()
    with pytest.raises(ValueError):
        generate_surrogate_key([])


def test_union_relations_null_fills_and_tags_provenance(spark):
    a = spark.createDataFrame([(1, "x")], "id long, a_only string")
    b = spark.createDataFrame([(2, 9.5)], "id long, b_only double")
    out = union_relations([a, b], source_names=["rel_a", "rel_b"])
    rows = {r._dbt_source_relation: r for r in out.collect()}
    assert set(out.columns) == {"id", "a_only", "b_only", "_dbt_source_relation"}
    assert rows["rel_a"].b_only is None and rows["rel_b"].a_only is None
    # no provenance column when disabled
    plain = union_relations([a, b], include_source_column=False)
    assert "_dbt_source_relation" not in plain.columns
    with pytest.raises(ValueError):
        union_relations([a, b], source_names=["only_one"])


def test_equal_rowcount_passes_and_fails(spark):
    a = spark.range(5)
    assert equal_rowcount(a, spark.range(5)).count() == 0
    fail = equal_rowcount(a, spark.range(8)).collect()
    assert len(fail) == 1 and fail[0].diff == 3


def test_expression_is_true_nulls_fail(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -1.0), (3, None)], "id long, v double"
    )
    failing = expression_is_true(df, "v >= 0").collect()
    assert sorted(r.id for r in failing) == [2, 3]


def test_at_least_one(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "id long, v string")
    assert at_least_one(df, "v").count() == 1
    assert at_least_one(df, "id").count() == 0


def test_builders_plug_into_evaluate_test(spark):
    from olist_snowflake_dbt_spark.operators.dq import TestStatus, evaluate_test

    df = spark.createDataFrame([(1, -5.0)], "id long, v double")
    res = evaluate_test("expr_true", expression_is_true(df, "v >= 0"))
    assert res.status == TestStatus.ERROR and res.failures == 1
