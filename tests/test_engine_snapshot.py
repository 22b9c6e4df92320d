"""Engine.snapshot / `dbt snapshot` orchestration: init on first run,
advance on later runs, warehouse-only state (a fresh Engine continues
the history), selection, and hard-delete passthrough."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olist_snowflake_dbt_spark.runner import Engine

T1, T2, T3 = (
    "2024-01-01 00:00:00",
    "2024-02-01 00:00:00",
    "2024-03-01 00:00:00",
)


def _eng(spark, tmp_path, rows):
    eng = Engine(spark, str(tmp_path))
    state = {"rows": rows}

    def src(spark_, engine):
        return spark_.createDataFrame(state["rows"], "k int, seg string")

    eng.register_snapshot(
        "dim_customer_snap",
        src,
        ["k"],
        strategy="check",
        check_cols=["seg"],
        hard_deletes="invalidate",
    )
    return eng, state


def test_snapshot_init_then_advance(spark, tmp_path):
    eng, state = _eng(spark, tmp_path, [(1, "a"), (2, "b")])
    rels = eng.snapshot(snapshot_time=T1)
    snap = rels["dim_customer_snap"].df
    assert snap.count() == 2
    assert snap.filter("dbt_valid_to IS NULL").count() == 2

    # advance: 1 changes, 2 vanishes (hard delete), 3 appears
    state["rows"] = [(1, "a2"), (3, "c")]
    eng.snapshot(snapshot_time=T2)

    # warehouse-only state: a FRESH engine continues the same history
    eng2, state2 = _eng(spark, tmp_path, [(1, "a2"), (3, "c"), (4, "d")])
    rels3 = eng2.snapshot(snapshot_time=T3)
    hist = rels3["dim_customer_snap"].df
    k1 = sorted(
        (str(r.dbt_valid_from), str(r.dbt_valid_to)) for r in hist.filter("k=1").collect()
    )
    assert k1 == [(T1, T2), (T2, "None")]  # closed at change, reopened
    assert [
        (str(r.dbt_valid_from), str(r.dbt_valid_to))
        for r in hist.filter("k=2").collect()
    ] == [(T1, T2)]  # hard-deleted: closed, never reopened
    assert hist.filter("k=4 AND dbt_valid_to IS NULL").count() == 1  # T3 insert
    # no-change keys accumulate no extra versions
    assert hist.filter("k=3").count() == 1


def test_snapshot_selection_and_unknown(spark, tmp_path):
    eng, _ = _eng(spark, tmp_path, [(1, "a")])
    eng.register_snapshot(
        "other_snap",
        lambda s, e: s.createDataFrame([(9, "z")], "k int, seg string"),
        ["k"],
        strategy="check",
        check_cols=["seg"],
    )
    rels = eng.snapshot(select="other_snap", snapshot_time=T1)
    assert list(rels) == ["other_snap"]
    import os

    assert not os.path.exists(os.path.join(str(tmp_path), "dim_customer_snap"))
    with pytest.raises(ValueError):
        eng.snapshot(select="nope", snapshot_time=T1)


def test_snapshot_timestamp_strategy_from_model(spark, tmp_path):
    eng = Engine(spark, str(tmp_path))
    src = spark.createDataFrame(
        [(1, "a", T1)], "k int, seg string, updated_at string"
    ).withColumn("updated_at", F.to_timestamp("updated_at"))
    eng.registry.register_source("dim_src", src)
    eng.register_snapshot(
        "ts_snap", "dim_src", ["k"], strategy="timestamp", updated_at="updated_at"
    )
    first = eng.snapshot()["ts_snap"].df
    assert [str(r.dbt_valid_from) for r in first.collect()] == [T1]
    # newer updated_at -> version advances
    src2 = spark.createDataFrame(
        [(1, "a2", T2)], "k int, seg string, updated_at string"
    ).withColumn("updated_at", F.to_timestamp("updated_at"))
    eng.registry.register_source("dim_src", src2)
    hist = eng.snapshot()["ts_snap"].df
    assert hist.count() == 2
    assert hist.filter("seg = 'a2' AND dbt_valid_to IS NULL").count() == 1


def test_snapshot_cli_command(spark, tmp_path, capsys):
    from olist_snowflake_dbt_spark import cli

    proj = tmp_path / "proj.py"
    proj.write_text(
        "def configure(eng):\n"
        "    eng.register_snapshot(\n"
        "        'cli_snap',\n"
        "        lambda s, e: s.createDataFrame([(1, 'a')], 'k int, seg string'),\n"
        "        ['k'], strategy='check', check_cols=['seg'])\n"
    )
    import sys

    sys.path.insert(0, str(tmp_path))
    try:
        rc = cli.main(
            [
                "snapshot",
                "--project", "proj:configure",
                "--warehouse", str(tmp_path / "wh"),
                "--seed-dir", str(tmp_path),  # no CSVs -> no seeds
            ],
            spark=spark,
        )
    finally:
        sys.path.remove(str(tmp_path))
    assert rc == 0
    out = capsys.readouterr().out
    assert "snapshotted cli_snap" in out