"""plans/timetravel.py: VersionedTable publish/read/vacuum semantics,
crash atomicity of the two-phase commit, and table_changes correctness
(including the old + changes == new round-trip invariant that makes a
CHANGES stream consumable by a downstream MERGE)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from olist_snowflake_dbt_spark.plans.timetravel import (
    VersionedTable,
    table_changes,
)


def _df(spark, rows):
    return spark.createDataFrame([Row(k=k, v=v) for k, v in rows])


@pytest.fixture()
def vt(spark, tmp_path):
    return VersionedTable(spark, str(tmp_path), "t")


def test_publish_read_versions_and_offsets(spark, vt):
    vt.publish(_df(spark, [(1, "a")]))
    vt.publish(_df(spark, [(1, "a"), (2, "b")]))
    vt.publish(_df(spark, [(2, "b")]))
    assert vt.current_version() == 3
    assert vt.read().count() == 1  # current
    assert vt.read(offset=-1).count() == 2  # AT(OFFSET => -1)
    assert vt.read(version=1).count() == 1  # AT(VERSION => 1)
    assert {r.k for r in vt.read(offset=-2).collect()} == {1}
    with pytest.raises(ValueError):
        vt.read(offset=-3)  # beyond retained history
    with pytest.raises(ValueError):
        vt.read(offset=1)  # future offsets don't exist
    with pytest.raises(FileNotFoundError):
        vt.read(version=99)


def test_read_before_any_publish_raises(spark, vt):
    with pytest.raises(FileNotFoundError):
        vt.read()
    with pytest.raises(FileNotFoundError):
        vt.current_version()


def test_vacuum_retention_and_orphan_sweep(spark, vt, tmp_path):
    for i in range(4):
        vt.publish(_df(spark, [(i, "x")]))
    # orphan from a simulated crashed publish (tmp dir never committed)
    orphan = os.path.join(vt.root, "v=99")
    os.makedirs(orphan)
    dropped = vt.vacuum(retain=2)
    assert dropped == [1, 2]
    assert vt.vacuum(retain=2) == []  # idempotent
    left = {e for e in os.listdir(vt.root) if e.startswith("v=")}
    assert left == {"v=3", "v=4"}  # old gens AND the orphan are gone
    assert vt.read(version=4).count() == 1
    with pytest.raises(FileNotFoundError):
        vt.read(version=1)
    with pytest.raises(ValueError):
        vt.vacuum(retain=0)


def test_crash_before_manifest_commit_publishes_nothing(spark, vt, monkeypatch):
    vt.publish(_df(spark, [(1, "a")]))
    # Simulate a crash AFTER the data rename but BEFORE the manifest
    # commit: os.replace (the commit point) raises.
    import olist_snowflake_dbt_spark.plans.timetravel as tt

    def boom(*a, **kw):
        raise OSError("crash at commit point")

    monkeypatch.setattr(tt.os, "replace", boom)
    with pytest.raises(OSError):
        vt.publish(_df(spark, [(2, "b")]))
    monkeypatch.undo()
    # Old generation stays fully visible; nothing new is readable.
    assert vt.current_version() == 1
    assert [r.k for r in vt.read().collect()] == [1]
    # Next publish succeeds and is assigned the reclaimed version slot.
    vt.publish(_df(spark, [(3, "c")]))
    assert vt.current_version() == 2
    assert json.load(open(vt._manifest_path))[-1]["version"] == 2


def test_table_changes_classification(spark):
    old = _df(spark, [(1, "a"), (2, "b"), (3, "c")])
    new = _df(spark, [(2, "B"), (3, "c"), (4, "d")])
    out = table_changes(old, new, ["k"]).collect()
    by = {(r.k, r.metadata_action): r for r in out}
    assert set(by) == {
        (1, "DELETE"),  # deleted key
        (2, "DELETE"), (2, "INSERT"),  # update = pair
        (4, "INSERT"),  # inserted key
    }  # key 3 unchanged -> absent
    assert by[(2, "DELETE")].metadata_isupdate is True
    assert by[(2, "INSERT")].metadata_isupdate is True
    assert by[(2, "DELETE")].v == "b" and by[(2, "INSERT")].v == "B"
    assert by[(1, "DELETE")].metadata_isupdate is False
    assert by[(4, "INSERT")].metadata_isupdate is False


def test_table_changes_null_payload_and_key(spark):
    old = spark.createDataFrame([(1, None), (None, "x")], "k int, v string")
    new = spark.createDataFrame([(1, "a"), (None, "x")], "k int, v string")
    out = table_changes(old, new, ["k"]).collect()
    # NULL key matches via eqNullSafe and is unchanged -> absent;
    # NULL->'a' payload change is a real update.
    acts = sorted((r.k, r.metadata_action) for r in out)
    assert acts == [(1, "DELETE"), (1, "INSERT")]


def test_table_changes_schema_mismatch_raises(spark):
    old = _df(spark, [(1, "a")])
    new = old.withColumnRenamed("v", "w")
    with pytest.raises(ValueError):
        table_changes(old, new, ["k"])


def test_changes_roundtrip_old_plus_delta_equals_new(spark, vt):
    """The stream-consumer contract: applying the CHANGES output to the
    old generation reproduces the new generation exactly."""
    old = _df(spark, [(i, f"v{i}") for i in range(20)])
    new = (
        old.filter(F.col("k") % 3 != 0)
        .withColumn(
            "v", F.when(F.col("k") % 5 == 0, F.lit("UP")).otherwise(F.col("v"))
        )
        .unionByName(_df(spark, [(100, "fresh")]))
    )
    ch = table_changes(old, new, ["k"])
    deleted = ch.filter("metadata_action = 'DELETE'").select("k")
    inserted = ch.filter("metadata_action = 'INSERT'").select("k", "v")
    rebuilt = old.join(deleted, "k", "left_anti").unionByName(inserted)
    assert rebuilt.exceptAll(new).count() == 0
    assert new.exceptAll(rebuilt).count() == 0


def test_driver_query_matches_duckdb_oracle(spark, sf_dir):
    import duckdb

    from olist_snowflake_dbt_spark.queries import ORACLE_SQL, QUERIES

    got = QUERIES["timetravel_changes"](spark, sf_dir)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{sf_dir}/customer.parquet')"
    )
    exp = con.execute(ORACLE_SQL["timetravel_changes"]).fetchall()
    g = sorted(map(tuple, got.collect()))
    assert len(g) == len(exp) > 0
    assert g == sorted(exp)


def test_stream_offsets_and_staleness(spark, vt):
    vt.publish(_df(spark, [(1, "a")]))
    from olist_snowflake_dbt_spark.plans.timetravel import TableStream

    s = TableStream(vt, "c1", ["k"])
    assert s.read().count() == 0  # caught up at creation
    vt.publish(_df(spark, [(1, "a"), (2, "b")]))
    first = s.read().collect()
    assert [(r.k, r.metadata_action) for r in first] == [(2, "INSERT")]
    # not advanced -> same delta again (at-least-once on consumer crash)
    assert s.read().count() == 1
    s.advance()
    assert s.read().count() == 0
    vt.publish(_df(spark, [(2, "b")]))
    second = s.read().collect()  # v2->v3 only: key 1 deleted
    assert [(r.k, r.metadata_action) for r in second] == [(1, "DELETE")]
    # two consumers keep independent offsets
    s2 = TableStream(vt, "c2", ["k"])
    assert s2.read().count() == 0 and s.read().count() == 1
    # retention passing the offset -> staleness error
    vt.publish(_df(spark, [(3, "c")]))
    vt.vacuum(retain=1)
    with pytest.raises(RuntimeError):
        s.read()


def test_ivm_maintained_equals_recompute_and_drops_empty_groups(spark):
    from olist_snowflake_dbt_spark.operators.incremental import (
        ivm_apply_changes,
    )

    v1 = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 5), (4, "c", 7)],
        "k int, g string, x int",
    )
    # delete all of group c, update one of a, insert new group d
    v2 = spark.createDataFrame(
        [(1, "a", 99), (2, "a", 20), (3, "b", 5), (9, "d", 1)],
        "k int, g string, x int",
    )
    agg1 = v1.groupBy("g").agg(
        F.count("*").alias("n_rows"), F.sum("x").alias("sum_x")
    )
    ch = table_changes(v1, v2, ["k"])
    got = ivm_apply_changes(
        agg1, ch, ["g"], sum_cols={"sum_x": "x"}
    )
    want = v2.groupBy("g").agg(
        F.count("*").alias("n_rows"), F.sum("x").alias("sum_x")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.filter("g = 'c'").count() == 0  # emptied group dropped
    # a second maintenance round composes
    v3 = v2.filter("k <> 9")
    got2 = ivm_apply_changes(
        got, table_changes(v2, v3, ["k"]), ["g"], sum_cols={"sum_x": "x"}
    )
    want2 = v3.groupBy("g").agg(
        F.count("*").alias("n_rows"), F.sum("x").alias("sum_x")
    )
    assert sorted(map(tuple, got2.collect())) == sorted(map(tuple, want2.collect()))


def test_restore_republishes_past_generation(spark, vt):
    vt.publish(_df(spark, [(1, "good")]))
    vt.publish(_df(spark, [(1, "bad"), (2, "worse")]))
    new_v = vt.restore(version=1)
    assert new_v == 3 and vt.current_version() == 3
    assert [r.v for r in vt.read().collect()] == ["good"]
    # history append-only: the bad generation stays readable for forensics
    assert sorted(r.v for r in vt.read(version=2).collect()) == ["bad", "worse"]
    # offset form agrees with read(): offset -2 from v3 is v1... and
    # restoring the CURRENT version is a legal no-op new generation
    assert vt.restore(offset=0) == 4
    assert [r.v for r in vt.read().collect()] == ["good"]


def test_restore_is_metadata_only_no_data_copy(spark, vt):
    vt.publish(_df(spark, [(1, "a")]))
    vt.publish(_df(spark, [(1, "b")]))
    vt.restore(version=1)
    vs = {v["version"]: v["path"] for v in vt.versions()}
    assert vs[3] == vs[1]  # the new manifest entry aliases the old files


def test_restore_then_vacuum_keeps_aliased_files(spark, vt):
    vt.publish(_df(spark, [(1, "keepme")]))
    vt.publish(_df(spark, [(1, "bad")]))
    vt.restore(version=1)           # v3 aliases v1's directory
    dropped = vt.vacuum(retain=1)   # drops entries v1 and v2
    assert dropped == [1, 2]
    # v1's directory survives because the CURRENT version points at it
    assert [r.v for r in vt.read().collect()] == ["keepme"]
    assert os.path.isdir(vt.versions()[-1]["path"])


def test_restore_unretained_version_raises(spark, vt):
    vt.publish(_df(spark, [(1, "a")]))
    with pytest.raises(FileNotFoundError, match="not retained"):
        vt.restore(version=9)
    with pytest.raises(ValueError, match="outside retained"):
        vt.restore(offset=-5)


def test_changes_across_restore_boundary(spark, vt):
    from olist_snowflake_dbt_spark.plans.timetravel import table_changes

    vt.publish(_df(spark, [(1, "a"), (2, "b")]))
    vt.publish(_df(spark, [(1, "a")]))          # v2 deletes k=2
    vt.restore(version=1)                        # v3 == v1 content
    ch = table_changes(vt.read(version=2), vt.read(version=3), ["k"]).collect()
    # the restore re-INSERTS what v2 deleted
    assert [(r.k, r.metadata_action) for r in ch] == [(2, "INSERT")]


def test_crash_at_restore_commit_changes_nothing(spark, vt, monkeypatch):
    import olist_snowflake_dbt_spark.plans.timetravel as tt

    vt.publish(_df(spark, [(1, "good")]))
    vt.publish(_df(spark, [(1, "bad")]))

    def boom(*a, **kw):
        raise OSError("crash at commit point")

    monkeypatch.setattr(tt.os, "replace", boom)
    with pytest.raises(OSError):
        vt.restore(version=1)
    monkeypatch.undo()
    # restore is manifest-only, so a crashed restore leaves the table
    # EXACTLY as it was — current version, content, and history
    assert vt.current_version() == 2
    assert [r.v for r in vt.read().collect()] == ["bad"]
    assert len(vt.versions()) == 2
    # and a retried restore lands cleanly
    assert vt.restore(version=1) == 3
    assert [r.v for r in vt.read().collect()] == ["good"]
