"""CLI surface tests (reference: automate_pipeline.py drives the dbt
CLI; this engine exposes the same command surface via __main__)."""

from __future__ import annotations

from decimal import Decimal

from olist_snowflake_dbt_spark.cli import main


def test_cli_build_runs_reference_pipeline_end_to_end(spark, tmp_path, capsys):
    rc = main(["build", "--warehouse", str(tmp_path / "wh")], spark=spark)
    out = capsys.readouterr().out
    assert rc == 0
    assert "OK: " in out and "6/6 tests passed" in out
    fct = spark.table("fct_orders")
    row = fct.filter("order_id = 'o01'").first()
    # seed inference typed price/freight as numbers; 58.90+119.90+13.29+20.13
    assert float(row.total_order_value) == 212.22
    # NULL propagation: the canceled order has no items -> NULL revenue
    assert fct.filter("order_id = 'o06'").first().total_order_value is None


def test_cli_ls_and_docs_and_seed(spark, tmp_path, capsys):
    rc = main(["ls", "--warehouse", str(tmp_path / "wh2")], spark=spark)
    out = capsys.readouterr().out.split()
    assert rc == 0
    assert {"stg_olist_orders", "stg_olist_customers", "stg_items",
            "fct_orders"} <= set(out)

    rc = main(["seed", "--warehouse", str(tmp_path / "wh2")], spark=spark)
    out = capsys.readouterr().out
    assert rc == 0 and "seeded olist_orders_dataset" in out

    rc = main(["docs", "--warehouse", str(tmp_path / "wh2")], spark=spark)
    out = capsys.readouterr().out
    assert rc == 0 and "docs.json" in out


def test_cli_run_threads_routes_through_concurrent_scheduler(
    spark, tmp_path, capsys
):
    rc = main(
        ["run", "--warehouse", str(tmp_path / "wh3"), "--threads", "4"],
        spark=spark,
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "built fct_orders" in out
    # concurrent and serial runs agree on the mart contents
    conc = {
        (r.order_id, None if r.total_order_value is None
         else Decimal(str(r.total_order_value)))
        for r in spark.table("fct_orders").collect()
    }
    rc = main(["run", "--warehouse", str(tmp_path / "wh4")], spark=spark)
    capsys.readouterr()
    assert rc == 0
    serial = {
        (r.order_id, None if r.total_order_value is None
         else Decimal(str(r.total_order_value)))
        for r in spark.table("fct_orders").collect()
    }
    assert conc == serial


def test_cli_selector_flag(spark, tmp_path, capsys):
    rc = main(
        ["ls", "--selector", "marts", "--warehouse", str(tmp_path / "wh5")],
        spark=spark,
    )
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 0
    assert out == ["fct_orders"]
    rc = main(
        ["run", "--selector", "marts", "--warehouse", str(tmp_path / "wh5")],
        spark=spark,
    )
    out = capsys.readouterr().out
    assert rc == 0 and "built fct_orders" in out


def test_compile_renders_refs_and_vars(spark, tmp_path):
    from olist_snowflake_dbt_spark.runner import Engine

    eng = Engine(spark, str(tmp_path / "wh"))
    src = spark.createDataFrame([(1, 2.0)], "id long, v double")
    eng.registry.register_source("rawtab", src)
    eng.registry = eng.registry  # no-op, keep flake quiet
    eng.registry.variables["cutoff"] = 7
    eng.registry.register(
        "m1", "SELECT id, v FROM {{ ref('rawtab') }} WHERE id < {{ var('cutoff') }}"
    )

    @eng.registry.model()
    def pymodel(ctx):
        return ctx.ref("m1")

    compiled = eng.compile()
    assert compiled["m1"] == "SELECT id, v FROM rawtab WHERE id < 7"
    assert compiled["pymodel"] is None


def test_compile_resolves_version_pins(spark, tmp_path):
    from olist_snowflake_dbt_spark.runner import Engine

    eng = Engine(spark, str(tmp_path / "wh"))
    src = spark.createDataFrame([(1,)], "id long")
    eng.registry.register_source("rawtab", src)
    eng.registry.register_versioned(
        "dim", {1: "SELECT id FROM {{ ref('rawtab') }}",
                2: "SELECT id, id*2 AS id2 FROM {{ ref('rawtab') }}"},
        latest=2,
    )
    eng.registry.register("usage", "SELECT * FROM {{ ref('dim', v=1) }}")
    compiled = eng.compile(select="usage")
    assert compiled["usage"] == "SELECT * FROM dim_v1"


def test_show_previews_limited_rows(spark, tmp_path):
    from olist_snowflake_dbt_spark.runner import Engine

    eng = Engine(spark, str(tmp_path / "wh"))
    src = spark.createDataFrame([(i, float(i)) for i in range(20)], "id long, v double")
    eng.registry.register_source("rawtab", src)
    eng.registry.register("m1", "SELECT id, v FROM {{ ref('rawtab') }}")
    out = eng.show("m1", limit=3)
    assert out.count() == 3
    import pytest as _pytest

    with _pytest.raises(ValueError):
        eng.show("m1", limit=0)


def test_cli_compile_and_show(spark, tmp_path, capsys):
    from olist_snowflake_dbt_spark.cli import main as cli_main

    rc = cli_main(
        ["compile", "--warehouse", str(tmp_path / "w"), "--select", "fct_orders"],
        spark=spark,
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "-- model: fct_orders" in out and "{{ ref(" not in out

    rc = cli_main(
        ["show", "--warehouse", str(tmp_path / "w2"), "--select", "fct_orders",
         "--limit", "2"],
        spark=spark,
    )
    assert rc == 0
    shown = capsys.readouterr().out.strip().splitlines()
    assert len(shown) == 3  # header + 2 rows

    rc = cli_main(["show", "--warehouse", str(tmp_path / "w3")], spark=spark)
    assert rc == 2


def test_run_full_refresh_flag_reaches_incremental(spark, tmp_path):
    """CLI `run --full-refresh` must rebuild incremental models from the
    current batch alone (dbt --full-refresh), not merge."""
    from olist_snowflake_dbt_spark.runner import Engine

    eng = Engine(spark, str(tmp_path / "wh"))
    batches = [[(1, 10.0)], [(2, 20.0)]]
    state = {"i": 0}

    @eng.registry.model(materialized="incremental", unique_key=["id"])
    def inc(ctx):
        return ctx.spark.createDataFrame(batches[state["i"]], "id long, v double")

    eng.full_refresh = False
    eng.run(select="inc")
    state["i"] = 1
    eng.registry.invalidate()
    eng.run(select="inc")
    assert eng.relations["inc"].df.count() == 2  # merged
    eng.registry.invalidate()
    eng.full_refresh = True  # what the CLI flag sets
    out = eng.run(select="inc")
    assert {r.id for r in out["inc"].df.collect()} == {2}


def test_run_operation_invokes_registered_macro(spark, tmp_path, capsys):
    from olist_snowflake_dbt_spark.cli import main as cli_main
    from olist_snowflake_dbt_spark.runner import Engine

    eng = Engine(spark, str(tmp_path / "wh"))
    seen = {}

    def grant_all(engine, role="analyst", n=1):
        seen["args"] = (role, n)
        return f"granted:{role}:{n}"

    eng.register_operation("grant_all", grant_all)
    assert eng.run_operation("grant_all", role="admin", n=3) == "granted:admin:3"
    assert seen["args"] == ("admin", 3)
    import pytest as _pytest

    with _pytest.raises(KeyError, match="no operation named"):
        eng.run_operation("nope")

    # CLI surface: unknown op → exit 2 with the registered list
    rc = cli_main(
        ["run-operation", "missing_macro", "--warehouse", str(tmp_path / "w2")],
        spark=spark,
    )
    assert rc == 2
    rc = cli_main(["run-operation", "--warehouse", str(tmp_path / "w3")], spark=spark)
    assert rc == 2


def test_source_freshness_registry_and_cli(spark, tmp_path, capsys):
    """Registered freshness contracts evaluated in bulk; dbt exit
    semantics (WARN passes, ERROR fails)."""
    import datetime as dt

    from olist_snowflake_dbt_spark.cli import main as cli_main
    from olist_snowflake_dbt_spark.runner import Engine

    eng = Engine(spark, str(tmp_path / "wh"))
    fresh = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 12, 0, 0))], "id long, loaded_at timestamp"
    )
    stale = spark.createDataFrame(
        [(1, dt.datetime(2023, 1, 1, 0, 0, 0))], "id long, loaded_at timestamp"
    )
    eng.registry.register_source("src_fresh", fresh)
    eng.registry.register_source("src_stale", stale)
    eng.register_source_freshness("src_fresh", "loaded_at", 86400, 864000)
    eng.register_source_freshness("src_stale", "loaded_at", 86400, 864000)
    as_of = dt.datetime(2024, 1, 1, 13, 0, 0)
    res = eng.check_source_freshness(as_of=as_of)
    assert res["src_fresh"].fresh
    assert not res["src_stale"].fresh
    assert res["src_stale"].status.name == "ERROR"

    # CLI with no contracts registered: informative, exit 0
    rc = cli_main(
        ["source-freshness", "--warehouse", str(tmp_path / "w2")], spark=spark
    )
    assert rc == 0
    assert "no source freshness" in capsys.readouterr().out


def test_cli_vars_override_and_clone_staging_cleanup(spark, tmp_path, capsys):
    import os

    from olist_snowflake_dbt_spark.cli import main as cli_main
    from olist_snowflake_dbt_spark.plans.materialize import clone_table
    from olist_snowflake_dbt_spark.runner import Engine

    # --vars reaches {{ var() }} rendering via compile
    rc = cli_main(
        ["compile", "--warehouse", str(tmp_path / "w"),
         "--select", "fct_orders", "--vars", '{"unused_var": 1}'],
        spark=spark,
    )
    assert rc == 0
    rc = cli_main(
        ["compile", "--warehouse", str(tmp_path / "w1"), "--vars", "[1,2]"],
        spark=spark,
    )
    assert rc == 2

    # clone staging: a leftover partial staging dir is swept; the
    # published clone only appears via the final atomic rename
    prod = Engine(spark, str(tmp_path / "prod"))
    src_df = spark.createDataFrame([(1, 2.0)], "id long, v double")
    prod.registry.register_source("rawtab", src_df)
    prod.registry.register(
        "t1", "SELECT id, v FROM {{ ref('rawtab') }}", materialized="table"
    )
    prod.run()
    src = os.path.join(prod.warehouse_dir, "t1")
    dst = str(tmp_path / "dev_t1")
    stale_stage = dst + ".__clone_tmp__"
    os.makedirs(stale_stage)
    open(os.path.join(stale_stage, "junk"), "w").write("partial")
    n = clone_table(src, dst)
    assert n > 0 and os.path.isdir(dst)
    assert not os.path.exists(stale_stage)
    assert not os.path.exists(os.path.join(dst, "junk"))
    got = spark.read.parquet(dst).collect()
    assert got[0].v == 2.0


def test_seed_select_and_ls_resource_types(spark, tmp_path, capsys):
    from olist_snowflake_dbt_spark.cli import main as cli_main

    # seed --select with an unknown name errors with exit 2
    rc = cli_main(
        ["seed", "--warehouse", str(tmp_path / "w0"), "--select", "nope_seed"],
        spark=spark,
    )
    assert rc == 2
    assert "unknown seeds" in capsys.readouterr().out

    # ls resource types: sources and tests list; all prefixes kinds
    rc = cli_main(
        ["ls", "--warehouse", str(tmp_path / "w1"),
         "--resource-type", "source"],
        spark=spark,
    )
    assert rc == 0
    sources = capsys.readouterr().out.split()
    assert sources, "demo project must register sources"
    rc = cli_main(
        ["ls", "--warehouse", str(tmp_path / "w2"), "--resource-type", "all"],
        spark=spark,
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "source:" in out and "test:" in out

    # sources match ONLY explicit source: tokens — graph-operator forms
    # select models/tests, never sources (dbt's source: method)
    rc = cli_main(
        ["ls", "--warehouse", str(tmp_path / "w3"),
         "--resource-type", "source", "--select", "+fct_orders"],
        spark=spark,
    )
    assert rc == 0
    assert not capsys.readouterr().out.split()
    rc = cli_main(
        ["ls", "--warehouse", str(tmp_path / "w4"),
         "--resource-type", "source", "--select", f"source:{sources[0]}"],
        spark=spark,
    )
    assert rc == 0
    assert capsys.readouterr().out.split() == [sources[0]]


def test_cli_vars_override_project_defaults(spark, tmp_path, capsys):
    """dbt --vars precedence: CLI values win over defaults a project's
    configure() sets — i.e. they are applied AFTER project load (the
    pre-load application silently inverted this)."""
    args = [
        "compile",
        "--select", "vars_model",
        "--project", "tests._vars_project:configure",
        "--warehouse", str(tmp_path / "whv"),
        "--vars", '{"cutoff": 2}',
    ]
    rc = main(args, spark=spark)
    out = capsys.readouterr().out
    assert rc == 0
    assert "LIMIT 2" in out             # CLI value rendered
    assert "LIMIT 5" not in out         # project default overridden

    # without --vars the project default applies
    rc = main(args[:-2], spark=spark)
    out = capsys.readouterr().out
    assert rc == 0 and "LIMIT 5" in out
