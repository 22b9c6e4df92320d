"""Property-based tests (hypothesis) for SCD-2 snapshots — the history
invariants that must hold for ANY sequence of source batches:

- **exactly one open row per live key** (valid_to IS NULL);
- **interval chaining**: per key, closed rows' valid_to equals the next
  row's valid_from — no gaps, no overlaps — and valid_from is strictly
  increasing;
- **idempotence** (check strategy): re-applying an unchanged source
  advances nothing;
- **current-state fidelity**: the open rows' tracked values equal the
  latest source values.

Example counts kept small — each example pays Spark jobs."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from olist_snowflake_dbt_spark.operators.snapshots import (
    snapshot_apply,
    snapshot_init,
)

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_T0 = dt.datetime(2024, 1, 1)

# a run = 2-3 source batches; each batch maps key -> value (values from a
# tiny pool so "unchanged" rows actually occur)
_batches_strategy = st.lists(
    st.dictionaries(
        st.integers(min_value=0, max_value=4),
        st.sampled_from(["red", "green", "blue"]),
        min_size=1,
        max_size=5,
    ),
    min_size=2,
    max_size=3,
)


def _src(spark, mapping, t):
    return spark.createDataFrame(
        [(k, v, t) for k, v in sorted(mapping.items())],
        "id long, color string, updated_at timestamp",
    )


def _replay(spark, batches):
    t = _T0
    snap = snapshot_init(_src(spark, batches[0], t), ["id"], "updated_at")
    for mapping in batches[1:]:
        t = t + dt.timedelta(days=1)
        snap = snapshot_apply(
            snap,
            _src(spark, mapping, t),
            ["id"],
            strategy="check",
            check_cols=["color"],
            snapshot_time=t,
        # production persists each snapshot generation to parquet between
        # runs (dbt snapshot = table materialization); localCheckpoint is
        # the in-test equivalent — it also truncates the ever-deepening
        # join lineage that otherwise trips AQE's codegen zip on old plans
        ).localCheckpoint()
    return snap, t


@given(_batches_strategy)
@settings(**_SETTINGS)
def test_scd2_one_open_row_and_chained_intervals(spark, batches):
    snap, _ = _replay(spark, batches)
    rows = snap.collect()
    seen_keys = {k for b in batches for k in b}
    open_rows = [r for r in rows if r.dbt_valid_to is None]
    # exactly one open row per key ever seen
    assert sorted(r.id for r in open_rows) == sorted(seen_keys)
    # per-key interval chain: ordered valid_from, each closed row's
    # valid_to == next row's valid_from
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r.id, []).append(r)
    for hist in by_key.values():
        hist.sort(key=lambda r: r.dbt_valid_from)
        for a, b in zip(hist, hist[1:]):
            assert a.dbt_valid_to == b.dbt_valid_from
            assert a.dbt_valid_from < b.dbt_valid_from
        assert hist[-1].dbt_valid_to is None


@given(_batches_strategy)
@settings(**_SETTINGS)
def test_scd2_check_idempotent_and_current(spark, batches):
    snap, t = _replay(spark, batches)
    # current state equals the union of latest values per key
    latest: dict[int, str] = {}
    for b in batches:
        latest.update(b)
    current = {
        r.id: r.color for r in snap.filter("dbt_valid_to IS NULL").collect()
    }
    assert current == latest
    # re-applying the FINAL state as a new batch changes nothing (check
    # strategy: no tracked column differs)
    again = snapshot_apply(
        snap,
        _src(spark, latest, t + dt.timedelta(days=1)),
        ["id"],
        strategy="check",
        check_cols=["color"],
        snapshot_time=t + dt.timedelta(days=1),
    )
    assert again.count() == snap.count()
    assert again.exceptAll(snap).count() == 0
