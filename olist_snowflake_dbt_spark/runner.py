"""Pipeline orchestration: seed / run / test with pass-fail gating.

The Spark rendering of the reference's entry points (SURVEY.md §3):
``dbt seed`` → :meth:`Engine.seed`, ``dbt run --select X`` →
:meth:`Engine.run`, ``dbt test --select X`` → :meth:`Engine.test`, and
``automate_pipeline.py``'s build-then-test-with-gating (reference:
automate_pipeline.py:10-26) → :meth:`Engine.pipeline`.

Execution is topological over the ref() DAG. Unlike dbt there is no
thread-pool of node runners — Spark parallelizes *within* each action,
and view models cost nothing until a table/test materializes them.
Table models write sequentially here; on a cluster you'd submit
independent subtree writes from concurrent threads into the same
SparkSession (scheduler pools) — the DAG API supports that without
semantic change.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .operators.dq import (
    TestResult,
    TestStatus,
    accepted_values_failures,
    evaluate_test,
    not_null_failures,
    relationship_failures,
    unique_failures,
)
from .plans.materialize import (
    DynamicTable,
    MaterializedRelation,
    materialize_table,
    materialize_view,
)
from .plans.registry import ModelRegistry
from .sources.seeds import seed_to_parquet


@dataclass
class TestSpec:
    """A declared data-quality test bound to a model (schema.yml analogue)."""

    name: str
    model: str
    builder: Callable[[DataFrame, "Engine"], DataFrame]  # → failing rows
    warn_if: int = 0
    error_if: int = 0
    store_failures: bool = False


@dataclass
class PipelineResult:
    relations: dict[str, MaterializedRelation]
    tests: list[TestResult]
    built_ok: bool
    tests_ok: bool

    @property
    def ok(self) -> bool:
        return self.built_ok and self.tests_ok


class Engine:
    """Facade over registry + materialization + tests + seeds."""

    def __init__(self, spark: SparkSession, warehouse_dir: str):
        self.spark = spark
        self.warehouse_dir = warehouse_dir
        self.registry = ModelRegistry(spark)
        self.tests: list[TestSpec] = []
        self.relations: dict[str, MaterializedRelation] = {}

    # -- seeds (dbt seed; SURVEY §3 entry point 2) --------------------
    def seed(self, seeds: dict[str, str], schemas: dict | None = None) -> None:
        for name, csv_path in seeds.items():
            schema = (schemas or {}).get(name)
            df = seed_to_parquet(self.spark, csv_path, self.warehouse_dir, name, schema)
            self.registry.register_source(name, df)

    # -- models (dbt run) ---------------------------------------------
    def run(self, select: str | None = None) -> dict[str, MaterializedRelation]:
        selected = self.registry.select(select)
        self.registry.invalidate()
        order = self.registry.topological_order(selected if select else None)
        out: dict[str, MaterializedRelation] = {}
        for name in order:
            if name not in selected:
                continue
            model = self.registry.models()[name]
            df = self.registry.build(name)
            if model.materialized == "table":
                rel = materialize_table(
                    self.spark,
                    name,
                    df,
                    self.warehouse_dir,
                    partition_by=tuple(model.config.get("partition_by", ())),
                )
                # downstream consumers read the *written* table, like a
                # warehouse CTAS (and so does the memoized registry entry)
                self.registry._built[name] = rel.df
            elif model.materialized == "incremental":
                # dbt `materialized='incremental'`: the model body yields
                # THIS run's batch; the engine merges it into the standing
                # table per the configured strategy (B1)
                from .operators.incremental import IncrementalTable

                import os

                t = IncrementalTable(
                    self.spark,
                    os.path.join(self.warehouse_dir, name),
                    tuple(model.config.get("partition_by", ())),
                )
                out_df = t.apply(
                    df,
                    strategy=model.config.get("strategy", "merge"),
                    unique_key=tuple(model.config.get("unique_key", ())),
                    dedupe_order=model.config.get("dedupe_order"),
                    event_time=model.config.get("event_time"),
                )
                out_df.createOrReplaceTempView(name)
                rel = MaterializedRelation(name, "incremental", t.path, out_df)
                self.registry._built[name] = out_df
            elif model.materialized == "dynamic_table":
                # B3: the model body yields a STREAMING DataFrame; each run
                # refreshes the standing table (durable `checkpoint` config
                # = incremental TARGET_LAG refresh; absent = full refresh)
                import os

                dt = DynamicTable(
                    self.spark,
                    os.path.join(self.warehouse_dir, name),
                    list(model.config.get("unique_key", ())),
                    tuple(model.config.get("partition_by", ())),
                )
                dt.refresh(df, checkpoint=model.config.get("checkpoint"))
                out_df = dt.read()
                out_df.createOrReplaceTempView(name)
                rel = MaterializedRelation(name, "dynamic_table", dt.path, out_df)
                self.registry._built[name] = out_df
            elif model.materialized == "ephemeral":
                rel = MaterializedRelation(name, "ephemeral", None, df)
            else:
                rel = materialize_view(name, df)
            out[name] = rel
            self.relations[name] = rel
        return out

    # -- tests (dbt test) ---------------------------------------------
    def add_test(self, spec: TestSpec) -> None:
        self.tests.append(spec)

    def test_unique(self, model: str, column: str, **kw) -> None:
        self.add_test(TestSpec(f"unique_{model}_{column}", model,
                               lambda df, _e: unique_failures(df, column), **kw))

    def test_not_null(self, model: str, column: str, **kw) -> None:
        self.add_test(TestSpec(f"not_null_{model}_{column}", model,
                               lambda df, _e: not_null_failures(df, column), **kw))

    def test_relationships(self, model: str, column: str, to: str, fieldname: str, **kw) -> None:
        def build(df: DataFrame, eng: "Engine") -> DataFrame:
            parent = eng.registry.build(to)
            return relationship_failures(df, column, parent, fieldname)

        self.add_test(TestSpec(f"relationships_{model}_{column}__{to}", model, build, **kw))

    def test_accepted_values(self, model: str, column: str, values: Sequence, **kw) -> None:
        self.add_test(TestSpec(f"accepted_values_{model}_{column}", model,
                               lambda df, _e: accepted_values_failures(df, column, values), **kw))

    def test_singular(self, name: str, model: str,
                      predicate: Callable[[DataFrame], DataFrame], **kw) -> None:
        self.add_test(TestSpec(name, model, lambda df, _e: predicate(df), **kw))

    def test(self, select: str | None = None) -> list[TestResult]:
        selected = self.registry.select(select)
        results = []
        for spec in self.tests:
            if spec.model not in selected:
                continue
            df = self.registry.build(spec.model)
            failing = spec.builder(df, self)
            store = (
                f"{self.warehouse_dir}/_test_failures/{spec.name}"
                if spec.store_failures
                else None
            )
            results.append(
                evaluate_test(spec.name, failing, spec.warn_if, spec.error_if, store)
            )
        return results

    # -- full pipeline with gating (automate_pipeline.py:10-26) -------
    def pipeline(self, select: str | None = None) -> PipelineResult:
        try:
            relations = self.run(select)
        except Exception:
            # build failure aborts before tests, like the reference's
            # early `return` on dbt run failure
            raise
        tests = self.test(select)
        tests_ok = all(t.status != TestStatus.ERROR for t in tests)
        return PipelineResult(relations, tests, built_ok=True, tests_ok=tests_ok)
