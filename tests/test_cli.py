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
