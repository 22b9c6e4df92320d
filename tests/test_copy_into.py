"""sources/copy_into.CopyInto: exactly-once-per-file loads, changed-file
postures, the at-least-once crash contract (append-then-commit order),
and O(new files) read cost."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import types as T

from olist_snowflake_dbt_spark.sources.copy_into import CopyInto

SCHEMA = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
)


def _drop(stage, name, rows):
    os.makedirs(stage, exist_ok=True)
    with open(os.path.join(stage, name), "w") as f:
        for i, v in rows:
            f.write(json.dumps({"id": i, "v": v}) + "\n")


@pytest.fixture()
def ci(spark, tmp_path):
    return CopyInto(spark, str(tmp_path / "stage"), str(tmp_path / "tgt"))


def test_exactly_once_per_file(spark, ci, tmp_path):
    stage = str(tmp_path / "stage")
    _drop(stage, "a.jsonl", [(1, "x"), (2, "y")])
    r1 = ci.run(SCHEMA)
    assert r1 == {"files_loaded": 1, "rows_loaded": 2, "files_skipped": 0}
    r2 = ci.run(SCHEMA)  # nothing new
    assert r2 == {"files_loaded": 0, "rows_loaded": 0, "files_skipped": 1}
    _drop(stage, "b.jsonl", [(3, "z")])
    r3 = ci.run(SCHEMA)
    assert r3 == {"files_loaded": 1, "rows_loaded": 1, "files_skipped": 1}
    assert sorted(r.id for r in ci.read(SCHEMA).collect()) == [1, 2, 3]


def test_changed_file_postures(spark, ci, tmp_path):
    stage = str(tmp_path / "stage")
    _drop(stage, "a.jsonl", [(1, "x")])
    ci.run(SCHEMA)
    _drop(stage, "a.jsonl", [(1, "x2")])  # same name, new content
    with pytest.raises(RuntimeError):
        ci.pending_files(on_changed="error")
    assert ci.pending_files(on_changed="skip") == []
    r = ci.run(SCHEMA, on_changed="reload")
    assert r["files_loaded"] == 1
    assert sorted(r.v for r in ci.read(SCHEMA).collect()) == ["x", "x2"]
    with pytest.raises(ValueError):
        ci.pending_files(on_changed="maybe")


def test_crash_before_history_commit_reloads_not_loses(
    spark, ci, tmp_path, monkeypatch
):
    """Crash between the data append and the history commit: the file
    loads AGAIN next run (at-least-once) — never silently lost."""
    stage = str(tmp_path / "stage")
    _drop(stage, "a.jsonl", [(1, "x")])
    import olist_snowflake_dbt_spark.sources.copy_into as m

    def boom(*a, **kw):
        raise OSError("crash at history commit")

    monkeypatch.setattr(m.os, "replace", boom)
    with pytest.raises(OSError):
        ci.run(SCHEMA)
    monkeypatch.undo()
    assert ci.load_history() == {}  # nothing committed
    r = ci.run(SCHEMA)  # re-run loads the file again
    assert r["files_loaded"] == 1
    # duplicate rows exist (documented at-least-once window) — and the
    # file is now in history, so a THIRD run is a no-op
    assert ci.read(SCHEMA).count() == 2
    assert ci.run(SCHEMA)["files_loaded"] == 0


def test_identical_redrop_under_new_name_loads(spark, ci, tmp_path):
    # history is per file name+content: same content under a NEW name is
    # a new file (Snowflake load history keys on path)
    stage = str(tmp_path / "stage")
    _drop(stage, "a.jsonl", [(1, "x")])
    ci.run(SCHEMA)
    _drop(stage, "a_copy.jsonl", [(1, "x")])
    assert ci.run(SCHEMA)["files_loaded"] == 1