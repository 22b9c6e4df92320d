"""Semantics tests for operators/timeseries.gap_fill."""

from __future__ import annotations

import pytest

from olist_snowflake_dbt_spark.operators.timeseries import gap_fill


def _run(spark, rows, **kw):
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_id long, value double"
    ).selectExpr(
        "user_id", "CAST(ts AS TIMESTAMP) AS ts", "event_id", "value"
    )
    out = gap_fill(
        df, key="user_id", ts="ts", value="value",
        step_seconds=3600, order_tiebreak="event_id", **kw,
    )
    return sorted(out.collect(), key=lambda r: (r.user_id, r.bucket))


def test_dense_spine_locf_and_lerp(spark):
    rows = [
        (1, "2024-01-01 00:10:00", 1, 10.0),
        (1, "2024-01-01 03:40:00", 2, 40.0),
    ]
    got = _run(spark, rows)
    # spine: hours 00..03 inclusive → 4 rows
    assert len(got) == 4
    assert [r.observed for r in got] == [10.0, None, None, 40.0]
    assert [r.locf for r in got] == [10.0, 10.0, 10.0, 40.0]
    # lerp on bucket epoch distance: 10 + 30*(1/3), 10 + 30*(2/3)
    assert got[1].interp == pytest.approx(20.0)
    assert got[2].interp == pytest.approx(30.0)
    assert got[0].interp == 10.0 and got[3].interp == 40.0


def test_trailing_edge_degrades_to_locf_and_leading_is_null(spark):
    rows = [
        (1, "2024-01-01 02:30:00", 1, 5.0),
    ]
    # single observation → 1-bucket spine, no edges to fill
    got = _run(spark, rows)
    assert len(got) == 1 and got[0].locf == 5.0 and got[0].interp == 5.0
    # two observations with a trailing empty bucket cannot exist (spine
    # spans min..max) — instead check leading NULL via an island with no
    # previous anchor: impossible by construction, so assert the
    # contract on the first bucket being an observation
    assert got[0].observed == 5.0


def test_keep_latest_within_bucket_uses_tiebreak(spark):
    rows = [
        (1, "2024-01-01 00:10:00", 1, 10.0),
        (1, "2024-01-01 00:10:00", 9, 99.0),  # same ts, higher event_id
        (1, "2024-01-01 01:00:00", 3, 1.0),
    ]
    got = _run(spark, rows)
    assert got[0].observed == 99.0


def test_multiple_keys_are_independent(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 1, 1.0),
        (1, "2024-01-01 02:00:00", 2, 3.0),
        (2, "2024-01-05 00:00:00", 3, 7.0),
    ]
    got = _run(spark, rows)
    u1 = [r for r in got if r.user_id == 1]
    u2 = [r for r in got if r.user_id == 2]
    assert len(u1) == 3 and len(u2) == 1
    assert u1[1].interp == pytest.approx(2.0)


def test_rejects_bad_step(spark):
    with pytest.raises(ValueError):
        gap_fill(spark.range(1), "id", "id", "id", step_seconds=0)
