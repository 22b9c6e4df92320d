"""Property-based tests (hypothesis) for the incremental strategies —
the dbt-semantics invariants that must hold for ANY (existing, batch):

- **merge**: output keys = keys(existing) ∪ keys(batch); batch rows win
  on collision; one row per key when inputs are key-unique; idempotent
  (re-applying the same batch changes nothing);
- **delete+insert**: every key in the batch appears with EXACTLY the
  batch's rows (duplicates preserved), untouched keys keep their
  existing rows;
- **insert_overwrite**: partition-level replacement — partitions in the
  batch carry exactly the batch rows, others exactly the existing rows;
  idempotent.

Example counts kept small — each example pays Spark jobs."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from olist_snowflake_dbt_spark.operators.incremental import (
    incremental_delete_insert,
    incremental_insert_overwrite,
    incremental_merge,
)

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# key-unique frames for merge; values tagged by side so wins are visible
_keys = st.lists(
    st.integers(min_value=0, max_value=12), min_size=1, max_size=8, unique=True
)


def _frame(spark, keys, side):
    return spark.createDataFrame(
        [(k, f"{side}_{k}", k % 3) for k in keys], "id long, v string, part int"
    )


@given(_keys, _keys)
@settings(**_SETTINGS)
def test_merge_upsert_invariants(spark, ekeys, bkeys):
    existing, batch = _frame(spark, ekeys, "old"), _frame(spark, bkeys, "new")
    out = incremental_merge(existing, batch, ["id"])
    rows = {r.id: r.v for r in out.collect()}
    assert set(rows) == set(ekeys) | set(bkeys)
    for k in bkeys:
        assert rows[k] == f"new_{k}"  # batch wins
    for k in set(ekeys) - set(bkeys):
        assert rows[k] == f"old_{k}"  # untouched keys survive
    # idempotence: merging the same batch again is a no-op
    again = {r.id: r.v for r in incremental_merge(out, batch, ["id"]).collect()}
    assert again == rows


@given(_keys, _keys)
@settings(**_SETTINGS)
def test_delete_insert_replaces_key_groups_exactly(spark, ekeys, bkeys):
    existing = _frame(spark, ekeys, "old")
    # duplicate every batch key: delete+insert must KEEP both copies
    batch = spark.createDataFrame(
        [(k, f"new_{k}", k % 3) for k in bkeys for _ in range(2)],
        "id long, v string, part int",
    )
    out = incremental_delete_insert(existing, batch, ["id"])
    got = Counter((r.id, r.v) for r in out.collect())
    want = Counter({(k, f"new_{k}"): 2 for k in bkeys})
    for k in set(ekeys) - set(bkeys):
        want[(k, f"old_{k}")] = 1
    assert got == want


@given(_keys, _keys)
@settings(**_SETTINGS)
def test_insert_overwrite_is_partition_exact_and_idempotent(spark, ekeys, bkeys):
    existing, batch = _frame(spark, ekeys, "old"), _frame(spark, bkeys, "new")
    out = incremental_insert_overwrite(existing, batch, ["part"])
    batch_parts = {k % 3 for k in bkeys}
    got = {(r.id, r.v) for r in out.collect()}
    want = {(k, f"new_{k}") for k in bkeys} | {
        (k, f"old_{k}") for k in ekeys if k % 3 not in batch_parts
    }
    assert got == want
    twice = {
        (r.id, r.v)
        for r in incremental_insert_overwrite(out, batch, ["part"]).collect()
    }
    assert twice == got
