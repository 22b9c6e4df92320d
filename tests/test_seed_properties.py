"""Property-based tests (hypothesis) for seed CSV type inference: for
arbitrary typed value columns, inference must pick the agate-precedence
type and round-trip every value exactly. Example counts are kept small —
each example pays a Spark CSV read."""

from __future__ import annotations

from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
import pyspark.sql.types as T

from olist_snowflake_dbt_spark.sources.seeds import read_seed_csv

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _roundtrip(spark, tmp_path, values: list[str]):
    path = tmp_path / "prop_seed.csv"
    path.write_text("col\n" + "\n".join(values) + "\n", encoding="utf-8")
    df = read_seed_csv(spark, str(path))
    return df.schema["col"].dataType, [r.col for r in df.collect()]


@given(
    st.lists(
        st.integers(min_value=-(10**18 - 1), max_value=10**18 - 1),
        min_size=1,
        max_size=6,
    )
)
@settings(**_SETTINGS)
def test_integers_infer_long_and_roundtrip(spark, tmp_path, xs):
    # ≤18-digit integers are the Long range by contract; longer integers
    # promote to Decimal(38,0) (overflow-safe), asserted below
    dtype, got = _roundtrip(spark, tmp_path, [str(x) for x in xs])
    assert dtype == T.LongType()
    assert sorted(got) == sorted(xs)


def test_19_digit_integers_promote_to_decimal(spark, tmp_path):
    big = 10**18  # 19 digits — would overflow nothing, but exceeds the
    # Long-claim regex, so the inferencer picks exact Decimal(38,0)
    dtype, got = _roundtrip(spark, tmp_path, [str(big), str(-big)])
    assert dtype == T.DecimalType(38, 0)
    assert sorted(got) == [Decimal(-big), Decimal(big)]


@given(
    st.lists(
        st.decimals(min_value=Decimal("-9e9"), max_value=Decimal("9e9"), places=2),
        min_size=1,
        max_size=6,
    )
)
@settings(**_SETTINGS)
def test_decimals_infer_decimal_and_roundtrip(spark, tmp_path, xs):
    # force at least one non-integral so Integer can't win
    xs = xs + [Decimal("0.25")]
    dtype, got = _roundtrip(spark, tmp_path, [f"{x:.2f}" for x in xs])
    assert dtype == T.DecimalType(38, 2)
    assert sorted(got) == sorted(xs)


@given(st.lists(st.booleans(), min_size=1, max_size=6))
@settings(**_SETTINGS)
def test_booleans_infer_boolean(spark, tmp_path, xs):
    dtype, got = _roundtrip(spark, tmp_path, [str(x).lower() for x in xs])
    assert dtype == T.BooleanType()
    assert got == xs


@given(
    st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=4),
    st.text(alphabet="abcxyz", min_size=1, max_size=8),
)
@settings(**_SETTINGS)
def test_mixed_int_text_falls_back_to_string(spark, tmp_path, xs, word):
    dtype, got = _roundtrip(spark, tmp_path, [str(x) for x in xs] + [word])
    assert dtype == T.StringType()
    assert word in got


@given(st.lists(st.sampled_from(["", "null"]), min_size=1, max_size=4))
@settings(**_SETTINGS)
def test_null_markers_stay_null_text(spark, tmp_path, xs):
    dtype, got = _roundtrip(spark, tmp_path, xs)
    assert dtype == T.StringType()  # all-NULL column falls back to Text
    # a fully-empty line is not a CSV record (reader skips it); only the
    # explicit "null" marker produces a row, and it must be NULL
    assert got == [None] * sum(1 for x in xs if x == "null")
