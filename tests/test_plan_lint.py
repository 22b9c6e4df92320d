"""Codebase-wide plan lint: builds the physical plan of EVERY registered
query that can be planned without side effects (streams, writers, and
pipeline runners excluded — their plan shapes are asserted in their own
test files) and rejects the two anti-patterns that silently kill 100 TB
runs:

- ``CartesianProduct`` — an unkeyed join that scales O(n*m). The
  broadcast brute-force paths (quantized/brute top-k) plan as
  BroadcastNestedLoopJoin over a broadcast side, which is the intended
  shape and NOT flagged here.
- ``BatchEvalPython`` — a row-at-a-time (pickled) Python UDF in the hot
  path; every Python lane in this engine must be Arrow-batched
  (ArrowEvalPython / mapInPandas / applyInPandas).

Currently every single plannable query is clean — the allowlists are
EMPTY and should stay that way."""

from __future__ import annotations

import pytest

from olist_snowflake_dbt_spark.queries import QUERIES

_SKIP_PREFIX = (
    "stream_", "mm_", "runner_", "dynamic_table", "incremental_",
    "materialize_", "clone_", "zorder", "fmt_", "sink_", "pyds_", "seed_",
)
_CARTESIAN_OK: set[str] = set()
_BATCH_EVAL_OK: set[str] = set()
# failing-rows queries whose PASS state is an empty result; everything
# else must be non-vacuous — an empty result on both engines would
# hash-match while proving nothing (caught live: a fixed Q11 share
# threshold went 0-row at sf0.1; an 8-code Q22 bucket list at sf0.001)
_EXPECTED_EMPTY = {"dq_singular_revenue_positive"}


@pytest.mark.parametrize(
    "name",
    [n for n in QUERIES if not n.startswith(_SKIP_PREFIX)],
)
def test_plan_has_no_antipatterns(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    if name not in _CARTESIAN_OK:
        assert "CartesianProduct" not in plan, f"{name}: cartesian join"
    if name not in _BATCH_EVAL_OK:
        assert "BatchEvalPython" not in plan, f"{name}: non-Arrow Python UDF"
    if name not in _EXPECTED_EMPTY:
        assert df.limit(1).count() == 1, f"{name}: vacuous (0-row) result"
