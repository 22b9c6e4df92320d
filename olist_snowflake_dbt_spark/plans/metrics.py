"""dbt-metrics-shaped semantic layer: declared measures → grain queries.

The reference's dbt project exposes models; modern dbt projects layer a
semantic model on top (dbt metrics / MetricFlow): a METRIC declares the
measure expression, its aggregation, the time dimension, and which
categorical dimensions it may be sliced by — and the engine compiles a
(metric, grain, dims) request into the aggregate query. This module is
that compiler for DataFrame models: declarative enough that every
request is a single Catalyst aggregate (map-side partials, one
exchange on the grain+dims key), exact enough for oracle parity
(measure math through DECIMAL; ratio metrics emit exact numerator /
denominator plus an IEEE-double quotient both engines reproduce).

Guardrails a semantic layer owes its users: requesting a dimension the
metric does not declare raises (the dbt-metrics contract that stops
accidental fan-out joins), and unknown grains raise rather than
silently bucketing wrong.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_GRAINS = ("year", "quarter", "month", "week", "day")


@dataclass(frozen=True)
class Metric:
    """A declared measure over a model (dbt metrics YAML, as code)."""

    name: str
    agg: str  # sum | count | count_distinct | avg
    expr: str  # measure column/expression on the model
    time_dim: str
    dims: tuple[str, ...] = field(default_factory=tuple)
    decimal: str = "decimal(18,2)"  # exactness type for sum/avg math
    decimal_wide: str = "decimal(38,2)"  # overflow-safe sum type


def _measure(metric: Metric) -> Column:
    e = F.expr(metric.expr)
    if metric.agg == "sum":
        return (
            F.sum(e.cast(metric.decimal)).cast(metric.decimal_wide)
            .cast("double")
            .alias(metric.name)
        )
    if metric.agg == "count":
        return F.count(F.lit(1)).cast("bigint").alias(metric.name)
    if metric.agg == "count_distinct":
        return F.count_distinct(e).cast("bigint").alias(metric.name)
    if metric.agg == "avg":
        # exact decimal sum over exact bigint count, divided as IEEE
        # doubles — deterministic and engine-portable, unlike native
        # AVG whose internal accumulation differs per engine
        return (
            F.sum(e.cast(metric.decimal)).cast(metric.decimal_wide)
            .cast("double")
            / F.count(e).cast("double")
        ).alias(metric.name)
    raise ValueError(f"unknown agg {metric.agg!r}")


def query_metric(
    model: DataFrame,
    metric: Metric,
    grain: str = "month",
    dims: Sequence[str] = (),
) -> DataFrame:
    """Compile (metric, grain, dims) → one aggregate DataFrame with
    columns (<grain>, *dims, <metric.name>)."""
    if grain not in _GRAINS:
        raise ValueError(f"unknown grain {grain!r}; one of {_GRAINS}")
    bad = [d for d in dims if d not in metric.dims]
    if bad:
        raise ValueError(
            f"metric {metric.name!r} does not declare dimension(s) {bad}; "
            f"declared: {list(metric.dims)}"
        )
    bucket = F.date_trunc(grain, F.col(metric.time_dim)).alias(grain)
    return model.groupBy(bucket, *[F.col(d) for d in dims]).agg(
        _measure(metric)
    )
