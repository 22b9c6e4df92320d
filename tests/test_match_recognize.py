"""MATCH_RECOGNIZE subset: NFA row-pattern semantics, measures, guards.

Oracle-side coverage for the driver query lives in queries_migration;
these tests pin the operator semantics the SQL replay can't reach —
true backtracking over overlapping DEFINEs, skip-past-last-row on
overlap candidates, and the argument guards.
"""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from olist_snowflake_dbt_spark.operators.match_recognize import (
    _compile_pattern,
    match_recognize,
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, seq long, event_type string, value decimal(18,2)"
    )


class TestFunnelSemantics:
    def _run(self, spark, rows, pattern="S C+ P"):
        df = _events(spark, rows)
        return match_recognize(
            df,
            partition_by="user_id",
            order_by="seq",
            pattern=pattern,
            define={
                "S": F.col("event_type") == "signup",
                "C": F.col("event_type") == "click",
                "P": F.col("event_type") == "purchase",
            },
            measures=[
                ("count", "C", "", "n_clicks"),
                ("first", "S", "seq", "start_seq"),
                ("last", "P", "seq", "end_seq"),
                ("sum", "C", "value", "click_value_sum"),
            ],
        ).collect()

    def test_basic_match_and_measures(self, spark):
        d = Decimal
        out = self._run(
            spark,
            [
                (1, 1, "signup", d("0")),
                (1, 2, "click", d("1.50")),
                (1, 3, "click", d("2.25")),
                (1, 4, "purchase", d("0")),
                (1, 5, "click", d("9")),  # trailing click: not in a match
            ],
        )
        assert len(out) == 1
        m = out[0]
        assert (m.user_id, m.match_num, m.n_rows) == (1, 1, 4)
        assert (m.n_clicks, m.start_seq, m.end_seq) == (2, 1, 4)
        assert m.click_value_sum == d("3.75")

    def test_skip_past_last_row_and_match_number(self, spark):
        d = Decimal("1")
        rows = [
            (1, i, t, d)
            for i, t in enumerate(
                ["signup", "click", "purchase",  # match 1
                 "view",                          # breaks adjacency
                 "signup", "click", "click", "purchase",  # match 2
                 "signup", "click", "view", "purchase"]   # C+ P broken: no match
            )
        ]
        out = sorted(self._run(spark, rows), key=lambda r: r.match_num)
        assert [(m.match_num, m.n_rows, m.n_clicks) for m in out] == [
            (1, 3, 1),
            (2, 4, 2),
        ]

    def test_adjacency_is_required(self, spark):
        # signup ... click with a view between them: S C+ is consecutive
        d = Decimal("1")
        out = self._run(
            spark,
            [(1, 1, "signup", d), (1, 2, "view", d),
             (1, 3, "click", d), (1, 4, "purchase", d)],
        )
        assert out == []

    def test_partitions_are_independent(self, spark):
        d = Decimal("1")
        rows = [(u, i, t, d) for u in (1, 2)
                for i, t in enumerate(["signup", "click", "purchase"])]
        out = self._run(spark, rows)
        assert sorted((m.user_id, m.match_num) for m in out) == [(1, 1), (2, 1)]


class TestNfaSemantics:
    def test_backtracking_over_overlapping_defines(self, spark):
        """Rows satisfying BOTH defines are claimed per pattern position
        — greedy A+ backtracks to leave one row for B (define-truth
        classification alone cannot express this)."""
        df = spark.createDataFrame(
            [(1, 1, 0), (1, 2, 0), (1, 3, 15)], "user_id long, seq long, v long"
        )
        out = match_recognize(
            df,
            "user_id",
            "seq",
            "A+ B",
            define={"A": F.col("v") >= 0, "B": F.col("v") >= 10},
            measures=[("count", "*", "", "width")],
        ).collect()
        assert len(out) == 1
        assert out[0].n_rows == 3 and out[0].width == 3

    def test_alternation_and_bounded_repeat(self, spark):
        df = spark.createDataFrame(
            [(1, i, t) for i, t in enumerate("ababbba")],
            "user_id long, seq long, t string",
        )
        out = match_recognize(
            df,
            "user_id",
            "seq",
            "(A|B){3,4}",
            define={"A": F.col("t") == "a", "B": F.col("t") == "b"},
        ).collect()
        # greedy leftmost over 7 rows: one width-4 match, then width-3
        assert sorted((m.match_num, m.n_rows) for m in out) == [(1, 4), (2, 3)]

    def test_empty_matches_are_skipped(self, spark):
        df = spark.createDataFrame(
            [(1, 1, "x"), (1, 2, "y")], "user_id long, seq long, t string"
        )
        out = match_recognize(
            df, "user_id", "seq", "A*", define={"A": F.col("t") == "z"}
        ).collect()
        assert out == []


class TestAllRowsPerMatch:
    def test_all_rows_emits_matched_rows_with_classifier(self, spark):
        d = Decimal("1")
        df = _events(
            spark,
            [
                (1, 1, "signup", d),
                (1, 2, "click", d),
                (1, 3, "click", d),
                (1, 4, "purchase", d),
                (1, 5, "view", d),       # unmatched: omitted
                (1, 6, "signup", d),     # S with no C+ P: omitted
            ],
        )
        out = match_recognize(
            df,
            "user_id",
            "seq",
            "S C+ P",
            define={
                "S": F.col("event_type") == "signup",
                "C": F.col("event_type") == "click",
                "P": F.col("event_type") == "purchase",
            },
            rows_per_match="all",
        ).collect()
        got = sorted((r.seq, r.match_num, r.row_num, r.classifier) for r in out)
        assert got == [
            (1, 1, 1, "S"),
            (2, 1, 2, "C"),
            (3, 1, 3, "C"),
            (4, 1, 4, "P"),
        ]

    def test_all_rows_rejects_measures_and_bad_mode(self, spark):
        df = spark.createDataFrame([(1, 1)], "u long, seq long")
        with pytest.raises(ValueError, match="rows_per_match"):
            match_recognize(
                df, "u", "seq", "A", define={"A": F.lit(True)},
                rows_per_match="windowed",
            )
        with pytest.raises(ValueError, match="ALL ROWS PER MATCH"):
            match_recognize(
                df, "u", "seq", "A", define={"A": F.lit(True)},
                measures=[("count", "A", "", "n")],
                rows_per_match="all",
            )


class TestGuards:
    def test_pattern_must_use_defined_variables(self, spark):
        df = spark.createDataFrame([(1, 1, "x")], "u long, seq long, t string")
        with pytest.raises(ValueError, match="no DEFINE"):
            match_recognize(df, "u", "seq", "A B", define={"A": F.lit(True)})

    def test_unsupported_pattern_char_and_var_budget(self, spark):
        df = spark.createDataFrame([(1, 1)], "u long, seq long")
        with pytest.raises(ValueError, match="unsupported pattern"):
            match_recognize(df, "u", "seq", "A^", define={"A": F.lit(True)})
        with pytest.raises(ValueError, match="at most 8"):
            match_recognize(
                df, "u", "seq", "A",
                define={f"V{i}": F.lit(True) for i in range(9)},
            )
        with pytest.raises(ValueError, match="measure variable"):
            match_recognize(
                df, "u", "seq", "A", define={"A": F.lit(True)},
                measures=[("count", "Z", "", "n")],
            )
        with pytest.raises(ValueError, match="unsupported measure"):
            match_recognize(
                df, "u", "seq", "A", define={"A": F.lit(True)},
                measures=[("median", "A", "seq", "m")],
            )

    def test_compile_translates_quantifiers_verbatim(self):
        rx = _compile_pattern("A+ (B|C){2,3} D?", ["A", "B", "C", "D"])
        # mask alphabet: chars for masks with each bit; quantifiers kept
        assert rx.pattern.count("{2,3}") == 1 and rx.pattern.count("?") == 1


def test_one_shuffle_plan(spark):
    """The operator's data movement is ONE hash partition by the match
    key (plus Arrow batch transfer) — pinned so the 100 TB shape can't
    silently regress."""
    df = spark.range(1000).select(
        (F.col("id") % 7).alias("user_id"),
        F.col("id").alias("seq"),
        (F.col("id") % 3).alias("v"),
    )
    out = match_recognize(
        df, "user_id", "seq", "A B",
        define={"A": F.col("v") == 0, "B": F.col("v") == 1},
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "FlatMapGroupsInArrow" in plan or "FlatMapGroupsInPandas" in plan
