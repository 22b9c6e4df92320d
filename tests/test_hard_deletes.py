"""operators/snapshots.snapshot_apply hard_deletes modes: ignore (dbt
historical default), invalidate (close the vanished key's open row), and
new_record (close + open tombstone with dbt_is_deleted), including the
repeated-run and revive edge cases that bite real pipelines."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olist_snowflake_dbt_spark.operators.snapshots import (
    snapshot_apply,
    snapshot_init,
)

T0, T1, T2 = (
    "2024-01-01 00:00:00",
    "2024-02-01 00:00:00",
    "2024-03-01 00:00:00",
)


def _src(spark, rows):
    return spark.createDataFrame(rows, "k int, seg string")


def _apply(snap, src, t, mode):
    return snapshot_apply(
        snap,
        src,
        ["k"],
        strategy="check",
        check_cols=["seg"],
        snapshot_time=t,
        hard_deletes=mode,
    )


@pytest.fixture()
def snap0(spark):
    return snapshot_init(
        _src(spark, [(1, "a"), (2, "b"), (3, "c")]), ["k"], F.lit(T0)
    )


def test_ignore_keeps_vanished_keys_open(spark, snap0):
    out = _apply(snap0, _src(spark, [(1, "a")]), T1, "ignore")
    open_keys = {r.k for r in out.filter("dbt_valid_to IS NULL").collect()}
    assert open_keys == {1, 2, 3}


def test_invalidate_closes_vanished_keys(spark, snap0):
    out = _apply(snap0, _src(spark, [(1, "a2")]), T1, "invalidate")
    rows = {(r.k, str(r.dbt_valid_to)) for r in out.collect()}
    # 2 and 3 closed at T1; 1 closed (changed) + reopened
    assert (2, T1) in rows and (3, T1) in rows
    open_rows = out.filter("dbt_valid_to IS NULL").collect()
    assert {(r.k, r.seg) for r in open_rows} == {(1, "a2")}
    assert "dbt_is_deleted" not in out.columns


def test_new_record_inserts_tombstone(spark, snap0):
    out = _apply(snap0, _src(spark, [(1, "a")]), T1, "new_record")
    assert "dbt_is_deleted" in out.columns
    tomb = out.filter("dbt_is_deleted").collect()
    assert {(r.k, str(r.dbt_valid_from), r.dbt_valid_to) for r in tomb} == {
        (2, T1, None),
        (3, T1, None),
    }
    live_open = out.filter("dbt_valid_to IS NULL AND NOT dbt_is_deleted")
    assert {r.k for r in live_open.collect()} == {1}


def test_new_record_second_run_does_not_redelete(spark, snap0):
    s1 = _apply(snap0, _src(spark, [(1, "a")]), T1, "new_record")
    s2 = _apply(s1, _src(spark, [(1, "a")]), T2, "new_record")
    # still exactly one tombstone version per vanished key
    tomb = s2.filter("dbt_is_deleted").collect()
    assert sorted((r.k, str(r.dbt_valid_from)) for r in tomb) == [
        (2, T1),
        (3, T1),
    ]
    assert s2.count() == s1.count()


def test_new_record_revive_closes_tombstone(spark, snap0):
    s1 = _apply(snap0, _src(spark, [(1, "a")]), T1, "new_record")
    # key 2 comes back with its ORIGINAL payload — must still revive
    s2 = _apply(s1, _src(spark, [(1, "a"), (2, "b")]), T2, "new_record")
    k2 = sorted(
        (str(r.dbt_valid_from), str(r.dbt_valid_to), r.dbt_is_deleted)
        for r in s2.filter("k = 2").collect()
    )
    assert k2 == [
        (T0, T1, False),  # original live version, closed at delete
        (T1, T2, True),  # tombstone, closed at revive
        (T2, "None", False),  # revived live version, open
    ]


def test_hard_delete_validation(spark, snap0):
    with pytest.raises(ValueError):
        _apply(snap0, _src(spark, []), T1, "bogus")
    with pytest.raises(ValueError):
        snapshot_apply(
            snap0,
            _src(spark, []),
            ["k"],
            strategy="check",
            check_cols=["seg"],
            hard_deletes="invalidate",  # no snapshot_time
            updated_at=None,
        )
