"""Sequence analytics: transition-matrix exactness and
dialogue-turn-stats semantics on hand-built sequences."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from olist_snowflake_dbt_spark.operators.sequence import (
    dialogue_turn_stats,
    transition_matrix,
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "key long, ts timestamp_ntz, state string"
    )


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 12, minute, second)


class TestTransitionMatrix:
    def test_counts_and_probs_exact(self, spark):
        """a→b twice, a→a once, b→a once within one key; counts and
        row-normalized probabilities are exact."""
        rows = [
            (1, _ts(0), "a"),
            (1, _ts(1), "b"),
            (1, _ts(2), "a"),
            (1, _ts(3), "a"),
            (1, _ts(4), "b"),
        ]
        got = {
            (r["src_state"], r["dst_state"]): (r["n_trans"], r["prob"])
            for r in transition_matrix(
                _events(spark, rows), "key", ["ts"], "state"
            ).collect()
        }
        assert got == {
            ("a", "b"): (2, round(2 / 3, 9)),
            ("a", "a"): (1, round(1 / 3, 9)),
            ("b", "a"): (1, 1.0),
        }

    def test_no_cross_key_transitions(self, spark):
        """The last state of key 1 must not chain into key 2."""
        rows = [(1, _ts(0), "a"), (2, _ts(1), "b")]
        assert (
            transition_matrix(_events(spark, rows), "key", ["ts"], "state")
            .count()
            == 0
        )

    def test_matrix_rows_bounded_by_states_squared(self, spark):
        """The output is at most |states|² rows however many events."""
        rows = [
            (k, _ts(m), s)
            for k in range(4)
            for m, s in enumerate(["x", "y", "x", "y", "x"])
        ]
        out = transition_matrix(_events(spark, rows), "key", ["ts"], "state")
        assert out.count() <= 4


class TestDialogueTurnStats:
    def _stats(self, spark, rows, gap=30):
        df = spark.createDataFrame(
            rows, "key long, ts timestamp_ntz, role string"
        )
        return {
            (r["key"], r["session_no"]): r
            for r in dialogue_turn_stats(
                df, "key", "ts", "role", gap_minutes=gap
            ).collect()
        }

    def test_strict_alternation_detected(self, spark):
        rows = [
            (1, _ts(0), "user"),
            (1, _ts(1), "assistant"),
            (1, _ts(2), "user"),
        ]
        r = self._stats(spark, rows)[(1, 1)]
        assert r["n_msgs"] == 3
        assert r["n_turns"] == 3
        assert r["strict_alternation"] is True
        assert r["starts_with_user"] is True
        assert r["duration_us"] == 120_000_000

    def test_same_role_run_collapses_turns(self, spark):
        """user,user,assistant = 2 turns; alternation broken."""
        rows = [
            (1, _ts(0), "user"),
            (1, _ts(1), "user"),
            (1, _ts(2), "assistant"),
        ]
        r = self._stats(spark, rows)[(1, 1)]
        assert r["n_turns"] == 2
        assert r["strict_alternation"] is False

    def test_gap_splits_sessions_and_resets_turns(self, spark):
        """A >30-min gap opens session 2; its first message starts a
        new turn even though the role matches the previous message."""
        rows = [
            (1, _ts(0), "user"),
            (1, _ts(1), "user"),
            (1, _ts(45), "user"),
        ]
        got = self._stats(spark, rows)
        assert got[(1, 1)]["n_msgs"] == 2
        assert got[(1, 1)]["n_turns"] == 1
        assert got[(1, 2)]["n_msgs"] == 1
        assert got[(1, 2)]["n_turns"] == 1
        assert got[(1, 2)]["starts_with_user"] is True

    def test_assistant_opener_flagged(self, spark):
        rows = [(1, _ts(0), "assistant"), (1, _ts(1), "user")]
        r = self._stats(spark, rows)[(1, 1)]
        assert r["starts_with_user"] is False

    def test_exact_gap_boundary_stays_in_session(self, spark):
        """gap == 30 min exactly does NOT split (strictly-greater)."""
        rows = [(1, _ts(0), "user"), (1, _ts(30), "assistant")]
        got = self._stats(spark, rows)
        assert list(got) == [(1, 1)]
        assert got[(1, 1)]["n_msgs"] == 2

    def test_one_exchange_plan(self, spark):
        """The whole stats pipeline shuffles once (on the key)."""
        rows = [(1, _ts(0), "user"), (1, _ts(1), "assistant")]
        df = spark.createDataFrame(
            rows, "key long, ts timestamp_ntz, role string"
        )
        plan = (
            dialogue_turn_stats(df, "key", "ts", "role")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange") <= 2  # key window + final agg


class TestCohortRetention:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "key long, ts timestamp_ntz")

    def test_triangle_exact(self, spark):
        from olist_snowflake_dbt_spark.operators.sequence import (
            cohort_retention,
        )

        d = dt.datetime
        rows = [
            # users 1,2 join Jan; 1 returns Feb; 2 doesn't; 3 joins Feb
            (1, d(2024, 1, 5)), (1, d(2024, 2, 9)),
            (2, d(2024, 1, 20)),
            (3, d(2024, 2, 1)),
        ]
        got = {
            (r["cohort_period"], r["period_offset"]): r
            for r in cohort_retention(
                self._df(spark, rows), "key", "ts"
            ).collect()
        }
        jan0 = got[("2024-01-01", 0)]
        jan1 = got[("2024-01-01", 1)]
        feb0 = got[("2024-02-01", 0)]
        assert (jan0["n_active"], jan0["n_cohort"]) == (2, 2)
        assert jan0["retention_ppm"] == 1_000_000
        assert (jan1["n_active"], jan1["retention_ppm"]) == (1, 500_000)
        assert (feb0["n_active"], feb0["n_cohort"]) == (1, 1)
        assert len(got) == 3

    def test_daily_granularity(self, spark):
        from olist_snowflake_dbt_spark.operators.sequence import (
            cohort_retention,
        )

        d = dt.datetime
        rows = [(1, d(2024, 1, 1)), (1, d(2024, 1, 3))]
        got = {
            r["period_offset"]: r
            for r in cohort_retention(
                self._df(spark, rows), "key", "ts", granularity="day"
            ).collect()
        }
        assert got[0]["cohort_period"] == "2024-01-01"
        assert got[2]["n_active"] == 1

    def test_bad_granularity_raises(self, spark):
        from olist_snowflake_dbt_spark.operators.sequence import (
            cohort_retention,
        )

        with pytest.raises(ValueError, match="granularity"):
            cohort_retention(
                self._df(spark, []), "key", "ts", granularity="week"
            )


class TestMadOutliers:
    def test_planted_spike_flagged_sigma_blind(self, spark):
        """A 1000x spike is flagged; the k-sigma trap (spike inflating
        the spread enough to hide itself) does not occur with MAD."""
        from olist_snowflake_dbt_spark.operators.monitoring import (
            mad_outliers,
        )

        vals = [10.0, 11.0, 9.0, 10.5, 9.5, 10.2, 10000.0]
        df = spark.createDataFrame(
            [("m", i, v) for i, v in enumerate(vals)],
            "g string, i long, v double",
        )
        out = {r["i"]: r for r in mad_outliers(df, "g", "v").collect()}
        assert out[6]["is_outlier"] is True
        assert all(out[i]["is_outlier"] is False for i in range(6))
        assert out[0]["med"] == 10.2  # median robust to the spike

    def test_zero_mad_group_flags_any_deviation(self, spark):
        """All-identical values: MAD=0, so any different value is an
        outlier and the identical ones are not (0 > 0 is false)."""
        from olist_snowflake_dbt_spark.operators.monitoring import (
            mad_outliers,
        )

        df = spark.createDataFrame(
            [("g", i, 5.0) for i in range(5)] + [("g", 9, 5.1)],
            "g string, i long, v double",
        )
        out = {r["i"]: r for r in mad_outliers(df, "g", "v").collect()}
        assert out[9]["is_outlier"] is True
        assert out[0]["is_outlier"] is False

    def test_guard(self, spark):
        from olist_snowflake_dbt_spark.operators.monitoring import (
            mad_outliers,
        )

        df = spark.createDataFrame([("g", 1.0)], "g string, v double")
        with pytest.raises(ValueError, match="k must be"):
            mad_outliers(df, "g", "v", k=0)


class TestAbTestZtest:
    def _run(self, spark, rows):
        from olist_snowflake_dbt_spark.operators.monitoring import (
            ab_test_ztest,
        )

        df = spark.createDataFrame(rows, "variant string, converted boolean")
        return ab_test_ztest(df, "variant", "converted", "A", "B").collect()[
            0
        ]

    def test_counts_rates_and_z_sign(self, spark):
        rows = (
            [("A", True)] * 30 + [("A", False)] * 70
            + [("B", True)] * 10 + [("B", False)] * 90
        )
        r = self._run(spark, rows)
        assert (r["n_a"], r["conv_a"], r["n_b"], r["conv_b"]) == (
            100, 30, 100, 10,
        )
        assert r["cr_a_ppm"] == 300_000 and r["cr_b_ppm"] == 100_000
        # p=0.2 pooled: z = 0.2 / sqrt(0.16*0.02) ~ 3.54 -> significant
        assert r["z_stat"] > 3.0 and r["significant"] is True

    def test_no_difference_not_significant(self, spark):
        rows = (
            [("A", True)] * 20 + [("A", False)] * 80
            + [("B", True)] * 20 + [("B", False)] * 80
        )
        r = self._run(spark, rows)
        assert r["z_stat"] == 0.0 and r["significant"] is False

    def test_degenerate_all_converted_null_z(self, spark):
        rows = [("A", True)] * 5 + [("B", True)] * 5
        r = self._run(spark, rows)
        assert r["z_stat"] is None and r["significant"] is False

    def test_other_variants_ignored(self, spark):
        rows = [("A", True), ("B", False), ("C", True), ("C", True)]
        r = self._run(spark, rows)
        assert r["n_a"] == 1 and r["n_b"] == 1


class TestCusumChangepoint:
    def _run(self, spark, series):
        from olist_snowflake_dbt_spark.operators.monitoring import (
            cusum_changepoint,
        )

        df = spark.createDataFrame(
            [("m", i, v) for i, v in enumerate(series)],
            "key string, t int, x long",
        )
        return cusum_changepoint(df, "key", "t", "x").collect()[0]

    def test_level_shift_found_at_the_step(self, spark):
        """10 flat values then 10 elevated: CUSUM maximizes exactly at
        the last pre-shift index."""
        r = self._run(spark, [10] * 10 + [20] * 10)
        assert r["t_star"] == 9
        # |n*cum - rn*total| at rn=10: |20*100 - 10*300| = 1000
        assert r["cusum_max_scaled"] == 1000
        assert r["n"] == 20

    def test_flat_series_stat_zero(self, spark):
        r = self._run(spark, [5] * 8)
        assert r["cusum_max_scaled"] == 0
        assert r["t_star"] == 0  # earliest tie wins

    def test_single_spike_maximizes_at_spike(self, spark):
        r = self._run(spark, [0, 0, 100, 0, 0])
        assert r["t_star"] in (1, 2)  # just before/at the spike
        assert r["cusum_max_scaled"] > 0


class TestWinsorize:
    def test_clips_to_band_and_keeps_nulls(self, spark):
        from olist_snowflake_dbt_spark.operators.monitoring import winsorize

        vals = [float(v) for v in range(1, 101)]
        df = spark.createDataFrame(
            [("g", v) for v in vals] + [("g", None)], "g string, v double"
        )
        out = winsorize(df, "g", "v", lo_pct=0.10, hi_pct=0.90)
        rows = out.collect()
        clipped = [r["clipped"] for r in rows if r["v"] is not None]
        lo = rows[0]["lo_bound"]
        hi = rows[0]["hi_bound"]
        assert min(clipped) == lo and max(clipped) == hi
        assert all(lo <= c <= hi for c in clipped)
        assert [r["clipped"] for r in rows if r["v"] is None] == [None]

    def test_guard(self, spark):
        import pytest as _pytest

        from olist_snowflake_dbt_spark.operators.monitoring import winsorize

        df = spark.createDataFrame([("g", 1.0)], "g string, v double")
        with _pytest.raises(ValueError, match="lo_pct"):
            winsorize(df, "g", "v", lo_pct=0.9, hi_pct=0.1)


class TestAdviceGuards:
    """Round-11 ADVICE.md fixes: empty-arm z-test, output-name
    collisions, checksum delimiter injection."""

    def test_ztest_empty_arm_yields_nulls_not_error(self, spark):
        from olist_snowflake_dbt_spark.operators.monitoring import (
            ab_test_ztest,
        )

        df = spark.createDataFrame(
            [("A", True), ("A", False)], "variant string, converted boolean"
        )
        r = ab_test_ztest(df, "variant", "converted", "A", "B").collect()[0]
        assert (r["n_a"], r["n_b"]) == (2, 0)
        assert r["cr_a_ppm"] == 500_000
        assert r["cr_b_ppm"] is None
        assert r["z_stat"] is None
        assert r["significant"] is False

    def test_ztest_both_arms_empty(self, spark):
        from olist_snowflake_dbt_spark.operators.monitoring import (
            ab_test_ztest,
        )

        df = spark.createDataFrame(
            [("C", True)], "variant string, converted boolean"
        )
        r = ab_test_ztest(df, "variant", "converted", "A", "B").collect()[0]
        assert (r["n_a"], r["n_b"]) == (0, 0)
        assert r["cr_a_ppm"] is None and r["cr_b_ppm"] is None
        assert r["z_stat"] is None and r["significant"] is False

    def test_mad_output_collision_raises(self, spark):
        from olist_snowflake_dbt_spark.operators.monitoring import (
            mad_outliers,
        )

        df = spark.createDataFrame(
            [("g", 1.0, 0.0)], "g string, v double, mad double"
        )
        with pytest.raises(ValueError, match="mad"):
            mad_outliers(df, "g", "v")

    def test_winsorize_output_collision_raises(self, spark):
        from olist_snowflake_dbt_spark.operators.monitoring import winsorize

        df = spark.createDataFrame(
            [("g", 1.0, 0.0)], "g string, v double, clipped double"
        )
        with pytest.raises(ValueError, match="clipped"):
            winsorize(df, "g", "v")

    def test_checksum_delimiter_injection_distinct(self, spark):
        """('a|b','c') vs ('a','b|c') and ('a',NULL) vs ('a','NULL')
        must checksum differently — per-column md5 rendering kills the
        concat_ws injection the old 'NULL'-sentinel rendering allowed."""
        from olist_snowflake_dbt_spark.operators.profiling import (
            table_checksum,
        )

        def ck(rows):
            df = spark.createDataFrame(rows, "x string, y string")
            return table_checksum(df, ["x", "y"]).collect()[0]["checksum"]

        assert ck([("a|b", "c")]) != ck([("a", "b|c")])
        assert ck([("a", None)]) != ck([("a", "NULL")])
        assert ck([("a", None)]) != ck([("a", "-")])
        # order-independence still holds
        assert ck([("a", "b"), ("c", "d")]) == ck([("c", "d"), ("a", "b")])
