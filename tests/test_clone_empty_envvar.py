"""dbt CLI-depth surface added in round 8: the ``clone`` task
(zero-copy environment seeding), the ``--empty`` schema dry run, and
``env_var()`` rendering with secret banning + checksum drift."""

from __future__ import annotations

import os

import pytest

from olist_snowflake_dbt_spark.cli import main as cli_main
from olist_snowflake_dbt_spark.plans.registry import CompilationError
from olist_snowflake_dbt_spark.runner import Engine


def _tiny(spark, wh: str) -> Engine:
    eng = Engine(spark, wh)
    src = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)],
        "id long, k string, v double",
    )
    eng.registry.register_source("raw", src)
    eng.registry.register(
        "agg",
        "SELECT k, SUM(v) AS total FROM {{ ref('raw') }} GROUP BY k",
        materialized="table",
    )
    return eng


# -- env_var() -------------------------------------------------------


def test_env_var_renders_value_and_default(spark, tmp_path, monkeypatch):
    eng = _tiny(spark, str(tmp_path / "wh"))
    eng.registry.register(
        "tagged",
        "SELECT k, {{ env_var('SG_TEST_LIM', '9') }} AS lim, "
        "{{ env_var('SG_TEST_TAG', 'dev') }} AS tag "
        "FROM {{ ref('raw') }}",
    )
    monkeypatch.setenv("SG_TEST_LIM", "5")
    monkeypatch.delenv("SG_TEST_TAG", raising=False)
    rows = eng.registry.build("tagged").collect()
    # env_var always yields strings (dbt context semantics)
    assert all(r.lim == "5" and r.tag == "dev" for r in rows)
    assert eng.registry.env_vars_used["SG_TEST_LIM"] == "5"
    assert eng.registry.env_vars_used["SG_TEST_TAG"] == "dev"


def test_env_var_missing_without_default_raises(spark, tmp_path, monkeypatch):
    eng = _tiny(spark, str(tmp_path / "wh"))
    monkeypatch.delenv("SG_TEST_NOPE", raising=False)
    eng.registry.register(
        "broken", "SELECT {{ env_var('SG_TEST_NOPE') }} AS x FROM {{ ref('raw') }}"
    )
    with pytest.raises(CompilationError, match="required but not provided"):
        eng.registry.build("broken")


def test_secret_env_var_banned_in_model_sql(spark, tmp_path, monkeypatch):
    eng = _tiny(spark, str(tmp_path / "wh"))
    monkeypatch.setenv("DBT_ENV_SECRET_TOKEN", "hunter2")
    eng.registry.register(
        "leaky",
        "SELECT {{ env_var('DBT_ENV_SECRET_TOKEN') }} AS t FROM {{ ref('raw') }}",
    )
    with pytest.raises(CompilationError, match="secret env var"):
        eng.registry.build("leaky")
    assert "DBT_ENV_SECRET_TOKEN" not in eng.registry.env_vars_used


def test_env_var_value_drift_changes_state_checksum(spark, tmp_path, monkeypatch):
    """state:modified must catch env drift without any SQL edit — dbt
    tracks manifest.env_vars for exactly this."""
    eng = _tiny(spark, str(tmp_path / "wh"))
    eng.registry.register(
        "enved", "SELECT {{ env_var('SG_TEST_CKS', '1') }} AS x FROM {{ ref('raw') }}"
    )
    monkeypatch.setenv("SG_TEST_CKS", "one")
    c1 = eng.registry.checksums()["enved"]
    monkeypatch.setenv("SG_TEST_CKS", "two")
    c2 = eng.registry.checksums()["enved"]
    monkeypatch.delenv("SG_TEST_CKS")
    c3 = eng.registry.checksums()["enved"]
    assert c1 != c2 and c2 != c3 and c1 != c3
    # a model NOT reading env vars is unaffected by env churn
    a1 = eng.registry.checksums()["agg"]
    monkeypatch.setenv("SG_TEST_CKS", "three")
    assert eng.registry.checksums()["agg"] == a1


# -- --empty ---------------------------------------------------------


def test_empty_run_materializes_schema_with_zero_rows(spark, tmp_path):
    eng = _tiny(spark, str(tmp_path / "wh"))
    rels = eng.run(empty=True)
    assert rels["agg"].df.columns == ["k", "total"]
    assert rels["agg"].df.count() == 0
    # the empty artifact really was written (a relation exists on disk)
    assert os.path.isdir(os.path.join(eng.warehouse_dir, "agg"))
    # a subsequent REAL run rebuilds with data (no empty-frame leakage)
    full = eng.run()
    assert full["agg"].df.count() == 2


def test_empty_run_still_enforces_contracts(spark, tmp_path):
    eng = _tiny(spark, str(tmp_path / "wh"))
    eng.registry.register(
        "contracted",
        "SELECT k, SUM(v) AS total FROM {{ ref('raw') }} GROUP BY k",
        materialized="table",
        contract={"columns": {"k": "string", "total": "bigint"}},  # wrong: double
    )
    with pytest.raises(Exception, match="contract"):
        eng.run(select="contracted", empty=True)


def test_empty_applies_to_python_models_and_sources(spark, tmp_path):
    eng = _tiny(spark, str(tmp_path / "wh"))

    @eng.registry.model(materialized="table")
    def py_copy(ctx):
        return ctx.source("raw").unionByName(ctx.ref("agg").selectExpr(
            "monotonically_increasing_id() AS id", "k", "total AS v"))

    rels = eng.run(select="+py_copy", empty=True)
    assert rels["py_copy"].df.count() == 0


# -- clone -----------------------------------------------------------


def test_clone_is_zero_copy_and_readable(spark, tmp_path):
    prod = _tiny(spark, str(tmp_path / "prod"))
    prod.run()
    dev = _tiny(spark, str(tmp_path / "dev"))
    cloned = dev.clone(prod.warehouse_dir)
    assert set(cloned) == {"agg"}
    got = {r.k: r.total for r in dev.relations["agg"].df.collect()}
    assert got == {"a": 40.0, "b": 20.0}
    # hardlink identity: at least one parquet data file shares an inode
    def inodes(d):
        out = {}
        for root, _dirs, files in os.walk(d):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    out[f] = os.stat(p).st_ino
        return out
    src_ino, dst_ino = inodes(os.path.join(prod.warehouse_dir, "agg")), inodes(cloned["agg"])
    assert src_ino and src_ino == dst_ino


def test_clone_skips_existing_unless_full_refresh(spark, tmp_path):
    prod = _tiny(spark, str(tmp_path / "prod"))
    prod.run()
    dev = _tiny(spark, str(tmp_path / "dev"))
    assert set(dev.clone(prod.warehouse_dir)) == {"agg"}
    # second clone: target exists → skipped (dbt clone semantics)
    assert dev.clone(prod.warehouse_dir) == {}
    # --full-refresh re-clones over it
    assert set(dev.clone(prod.warehouse_dir, full_refresh=True)) == {"agg"}


def test_clone_skips_nodes_without_artifacts(spark, tmp_path):
    prod = _tiny(spark, str(tmp_path / "prod"))
    prod.registry.register(
        "just_a_view", "SELECT k FROM {{ ref('raw') }}", materialized="view"
    )
    prod.run()
    dev = _tiny(spark, str(tmp_path / "dev"))
    dev.registry.register(
        "just_a_view", "SELECT k FROM {{ ref('raw') }}", materialized="view"
    )
    cloned = dev.clone(prod.warehouse_dir)
    assert "just_a_view" not in cloned and "agg" in cloned


def test_cli_clone_and_empty_flags(spark, tmp_path, capsys):
    """CLI surface: `clone` requires --defer; run --empty builds empty."""
    rc = cli_main(["clone", "--warehouse", str(tmp_path / "w1")], spark=spark)
    assert rc == 2
    out = capsys.readouterr().out
    assert "requires --defer" in out


def test_compile_renders_env_var_and_bans_secrets(spark, tmp_path, monkeypatch):
    """compile_sql routes through the same renderer as build: env_var
    values render to literals and DBT_ENV_SECRET_* raises — a secret can
    never reach a compiled artifact (dbt's guarantee)."""
    eng = _tiny(spark, str(tmp_path / "wh"))
    monkeypatch.setenv("SG_TEST_CMP", "42")
    eng.registry.register(
        "cmp", "SELECT {{ env_var('SG_TEST_CMP') }} AS x FROM {{ ref('raw') }}"
    )
    assert eng.compile(select="cmp")["cmp"] == "SELECT '42' AS x FROM raw"
    monkeypatch.setenv("DBT_ENV_SECRET_X", "s3cr3t")
    eng.registry.register(
        "leaky2",
        "SELECT {{ env_var('DBT_ENV_SECRET_X') }} AS t FROM {{ ref('raw') }}",
    )
    with pytest.raises(CompilationError, match="secret env var"):
        eng.compile(select="leaky2")
