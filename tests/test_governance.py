"""operators/governance.py: masking styles, schema stability of the
governed view, deny-by-default row access, and the broadcast-semi-join
plan shape (no fact shuffle)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olist_snowflake_dbt_spark.operators.governance import (
    apply_masking,
    apply_row_access,
    mask_expr,
)


@pytest.fixture()
def people(spark):
    return spark.createDataFrame(
        [(1, "Ada Lovelace", "555-0100", 1200.50), (2, "Mary Shelley", "555-0199", 80.25)],
        "id int, name string, phone string, balance double",
    )


def test_mask_styles(spark, people):
    row = people.select(
        mask_expr("name", "redact").alias("r"),
        mask_expr("phone", "partial", keep=4).alias("p"),
        mask_expr("name", "token").alias("t"),
        mask_expr("balance", "null").alias("n"),
    ).first()
    assert row.r == "***MASKED***"
    assert row.p == "555-****"
    assert len(row.t) == 32 and row.t != "Ada Lovelace"
    assert row.n is None
    with pytest.raises(ValueError):
        mask_expr("name", "rot13")


def test_apply_masking_schema_stable_and_role_gated(spark, people):
    policies = {
        "name": (["admin"], mask_expr("name", "redact")),
        "balance": (["admin"], mask_expr("balance", "null")),
    }
    admin = apply_masking(people, "admin", policies)
    analyst = apply_masking(people, "analyst", policies)
    # stable names+types (nullability may tighten on literal masks)
    assert admin.dtypes == people.dtypes == analyst.dtypes
    assert admin.collect() == people.collect()  # cleartext passthrough
    got = {r.id: (r.name, r.balance, r.phone) for r in analyst.collect()}
    assert got[1] == ("***MASKED***", None, "555-0100")  # ungoverned col intact


def test_token_masking_preserves_joinability(spark, people):
    policies = {"name": ([], mask_expr("name", "token"))}
    a = apply_masking(people, "x", policies).select("id", "name")
    b = apply_masking(people.select("id", "name"), "y", policies)
    assert a.join(b, ["id", "name"]).count() == 2  # tokens join across tables


def test_row_access_deny_by_default_and_plan(spark, people):
    grants = spark.createDataFrame(
        [("analyst", 1)], "role string, id int"
    )
    seen = apply_row_access(people, "analyst", grants, on=["id"])
    assert [r.id for r in seen.collect()] == [1]
    nothing = apply_row_access(people, "intern", grants, on=["id"])
    assert nothing.count() == 0  # unlisted role sees NOTHING
    with pytest.raises(NotImplementedError):
        apply_row_access(
            people, "analyst", grants, on=["id"], unlisted_role_sees_nothing=False
        )
    plan = seen._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan

class TestErasureCascade:
    def _frames(self, spark):
        people = spark.createDataFrame(
            [(1, "ann"), (2, "bob"), (3, "cal")], "pid int, name string"
        )
        facts = spark.createDataFrame(
            [(10, 1, "x", 5.0), (11, 1, "y", 6.0), (12, 2, "z", 7.0)],
            "fid int, pid int, note string, amt double",
        )
        subjects = people.filter("pid = 1").select("pid")
        return people, facts, subjects

    def test_delete_and_pseudonymize(self, spark):
        from olist_snowflake_dbt_spark.operators.governance import erasure_cascade

        people, facts, subjects = self._frames(spark)
        out, audit = erasure_cascade(
            subjects,
            "pid",
            {
                "people": {"df": people, "key": "pid", "action": "delete"},
                "facts": {
                    "df": facts,
                    "key": "pid",
                    "action": "pseudonymize",
                    "redact_cols": ["note"],
                },
            },
        )
        assert sorted(r.pid for r in out["people"].collect()) == [2, 3]
        rows = {r.fid: r for r in out["facts"].collect()}
        # erased subject: md5 surrogate, note NULLed, amt (analytics) kept
        import hashlib

        surr = hashlib.md5(b"1").hexdigest()
        assert rows[10].pid == surr and rows[11].pid == surr  # deterministic+joinable
        assert rows[10].note is None and rows[10].amt == 5.0
        # untouched subject: cleartext key, note intact
        assert rows[12].pid == "2" and rows[12].note == "z"
        a = {r.table_name: r for r in audit.collect()}
        assert (a["people"].n_affected, a["people"].n_kept) == (1, 2)
        assert (a["facts"].n_affected, a["facts"].n_kept) == (2, 3)
        assert a["facts"].n_distinct_surrogates == 1
        assert all(r.n_residual_links == 0 for r in a.values())

    def test_unknown_action_raises(self, spark):
        import pytest

        from olist_snowflake_dbt_spark.operators.governance import erase_subjects

        people, facts, subjects = self._frames(spark)
        with pytest.raises(ValueError, match="unknown erasure action"):
            erase_subjects(facts, subjects, "pid", "pid", action="shred")


class TestKAnonymityAudit:
    def _audit(self, spark, rows, **kw):
        from olist_snowflake_dbt_spark.operators.governance import (
            k_anonymity_audit,
        )

        df = spark.createDataFrame(rows, "zip string, age int, disease string")
        return {
            (r["zip"], r["age"]): r
            for r in k_anonymity_audit(
                df, ["zip", "age"], "disease", **kw
            ).collect()
        }

    def test_small_group_flags_k(self, spark):
        rows = [("02138", 30, "flu")] * 2 + [("02139", 40, "flu")] * 5
        got = self._audit(spark, rows, k=3, l=1)
        assert got[("02138", 30)]["k_violation"] is True
        assert got[("02139", 40)]["k_violation"] is False

    def test_homogeneous_group_flags_l(self, spark):
        """k-large but everyone shares the secret: l-diversity fires —
        the leak plain k-anonymity misses."""
        rows = [("02138", 30, "flu")] * 10 + [
            ("02139", 40, "flu"),
            ("02139", 40, "cold"),
        ]
        got = self._audit(spark, rows, k=3, l=2)
        a = got[("02138", 30)]
        assert a["k_violation"] is False and a["l_violation"] is True
        b = got[("02139", 40)]
        assert b["l_violation"] is False

    def test_guards(self, spark):
        import pytest as _pytest

        from olist_snowflake_dbt_spark.operators.governance import (
            k_anonymity_audit,
        )

        df = spark.createDataFrame([("a", 1, "x")], "zip string, age int, disease string")
        with _pytest.raises(ValueError, match="positive"):
            k_anonymity_audit(df, ["zip"], "disease", k=0)
        with _pytest.raises(ValueError, match="quasi-identifier"):
            k_anonymity_audit(df, [], "disease")
