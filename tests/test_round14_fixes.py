"""Round-14 hardening pins — the four round-13 advisories plus the
degenerate-bucket guard:

- **integer-div bucketing**: exact_global_rank / token_budget_select
  bucket with int64 ``div`` (no float round trip), so values past 2^53
  rank exactly.
- **NULL posture**: NULL order values are excluded from ranking (dense
  ranks from 1); NULL score/token rows come back ``keep = false``
  instead of silently vanishing in the bucket equi-join.
- **true SQL NTILE**: the phase column equals Spark's own
  ``ntile(k)`` over the global order, remainder distribution included.
- **degenerate-bucket guard**: a near-constant order/score column
  (one bucket > max_bucket_frac of >= guard_min_rows rows) hard-fails
  in-plan instead of silently re-creating the single-partition sort.
- **ks_two_sample NULL exclusion**: NULL observations count into
  neither n_ref/n_cur nor the CDF.
"""

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from olist_snowflake_dbt_spark.operators.monitoring import ks_two_sample
from olist_snowflake_dbt_spark.operators.sampling import (
    exact_global_rank,
    token_budget_select,
)


class TestIntegerDivBucketing:
    def test_ranks_exact_past_2_pow_53(self, spark):
        # distinct int64 order values above the double-exact range:
        # a float-divided bucket index would be allowed to merge or
        # round these; integer div must keep every rank exact
        big = 1 << 60
        rows = [(i, big + (i * 9973) % 500 - 250) for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, s long").repartition(5)
        got = {
            r.doc_id: r.global_rank
            for r in exact_global_rank(df, "s", "doc_id").collect()
        }
        ref = {
            r.doc_id: r.rn
            for r in df.withColumn(
                "rn",
                F.row_number().over(
                    W.orderBy(F.col("s").asc(), F.col("doc_id").asc())
                ),
            ).collect()
        }
        assert got == ref

    def test_budget_keep_set_exact_past_2_pow_53(self, spark):
        big = 1 << 59
        rows = [
            (i, -big - ((i * 37) % 23) * 50, (i * 13) % 40 + 5)
            for i in range(150)
        ]
        df = spark.createDataFrame(rows, "doc_id long, score long, tok long")
        out = {
            r.doc_id: r.keep
            for r in token_budget_select(df, "score", "tok", "doc_id").collect()
        }
        budget = (sum(t for _, _, t in rows) * 3) // 10
        kept, spent = set(), 0
        for i, s, t in sorted(rows, key=lambda r: (-r[1], r[0])):
            if spent + t > budget:
                break
            kept.add(i)
            spent += t
        assert {i for i, k in out.items() if k} == kept


class TestNullPosture:
    def test_rank_excludes_null_order_rows_ranks_stay_dense(self, spark):
        rows = [(i, i * 10 if i % 3 else None) for i in range(30)]
        df = spark.createDataFrame(rows, "doc_id long, s long")
        out = exact_global_rank(df, "s", "doc_id", phases=4).collect()
        n_nonnull = sum(1 for _, s in rows if s is not None)
        assert len(out) == n_nonnull
        assert sorted(r.global_rank for r in out) == list(
            range(1, n_nonnull + 1)
        )

    def test_budget_null_rows_kept_false_and_spend_unaffected(self, spark):
        rows = [(i, (i * 7) % 50, 10) for i in range(40)]
        nulls = [(100, None, 10), (101, 5, None), (102, None, None)]
        df = spark.createDataFrame(
            rows + nulls, "doc_id long, score long, tok long"
        )
        clean = spark.createDataFrame(rows, "doc_id long, score long, tok long")
        out = {
            r.doc_id: r.keep
            for r in token_budget_select(df, "score", "tok", "doc_id").collect()
        }
        ref = {
            r.doc_id: r.keep
            for r in token_budget_select(
                clean, "score", "tok", "doc_id"
            ).collect()
        }
        # every input row comes back; NULL rows are keep=false; the
        # non-NULL keep-set is exactly the clean corpus's (NULL rows
        # neither consume budget nor perturb buckets)
        assert len(out) == len(rows) + len(nulls)
        assert out[100] is False and out[101] is False and out[102] is False
        assert {i: k for i, k in out.items() if i < 100} == ref


class TestTrueNtile:
    @pytest.mark.parametrize("n,k", [(103, 4), (10, 4), (7, 3), (3, 5)])
    def test_phase_equals_spark_native_ntile(self, spark, n, k):
        rows = [(i, (i * 37) % 17) for i in range(n)]
        df = spark.createDataFrame(rows, "doc_id long, s long")
        got = {
            r.doc_id: r.phase
            for r in exact_global_rank(df, "s", "doc_id", phases=k).collect()
        }
        ref = {
            r.doc_id: r.nt
            for r in df.withColumn(
                "nt",
                F.ntile(k).over(
                    W.orderBy(F.col("s").asc(), F.col("doc_id").asc())
                ),
            ).collect()
        }
        assert got == ref


class TestDegenerateBucketGuard:
    def test_constant_order_raises_when_over_floor(self, spark):
        df = spark.createDataFrame(
            [(i, 42) for i in range(500)], "doc_id long, s long"
        )
        with pytest.raises(Exception, match="near-constant|bucket"):
            exact_global_rank(
                df, "s", "doc_id", guard_min_rows=100
            ).collect()

    def test_constant_score_raises_in_budget_select(self, spark):
        df = spark.createDataFrame(
            [(i, 42, 10) for i in range(500)],
            "doc_id long, score long, tok long",
        )
        with pytest.raises(Exception, match="near-constant|bucket"):
            token_budget_select(
                df, "score", "tok", "doc_id", guard_min_rows=100
            ).collect()

    def test_small_corpus_below_floor_never_trips(self, spark):
        # default floor is 1M rows: tiny constant-score corpora are a
        # one-task sort anyway and must pass untouched
        df = spark.createDataFrame(
            [(i, 42) for i in range(500)], "doc_id long, s long"
        )
        out = exact_global_rank(df, "s", "doc_id").collect()
        assert sorted(r.global_rank for r in out) == list(range(1, 501))

    def test_spread_order_stays_parallel_over_floor(self, spark):
        df = spark.createDataFrame(
            [(i, i * 3) for i in range(2000)], "doc_id long, s long"
        )
        out = exact_global_rank(
            df, "s", "doc_id", guard_min_rows=100
        ).collect()
        assert len(out) == 2000


class TestKsNullExclusion:
    def test_null_values_excluded_from_counts_and_cdf(self, spark):
        ref_rows = [(float(v),) for v in [1, 1, 2, 3, 5]]
        cur_rows = [(float(v),) for v in [2, 3, 3, 8]]
        ref = spark.createDataFrame(ref_rows, "v double")
        cur = spark.createDataFrame(cur_rows, "v double")
        ref_n = spark.createDataFrame(
            ref_rows + [(None,), (None,)], "v double"
        )
        cur_n = spark.createDataFrame(cur_rows + [(None,)], "v double")
        clean = ks_two_sample(ref, cur, "v").collect()[0]
        noisy = ks_two_sample(ref_n, cur_n, "v").collect()[0]
        assert noisy.n_ref == len(ref_rows) and noisy.n_cur == len(cur_rows)
        assert (noisy.d_scaled, noisy.ks_micro, noisy.reject) == (
            clean.d_scaled,
            clean.ks_micro,
            clean.reject,
        )


class TestUnimaxAllocation:
    def _brute(self, caps, budget):
        """Reference waterfill: repeatedly give every live group the
        uniform share of what's left, capping as groups fill."""
        import math

        alloc = {g: 0 for g in caps}
        live = dict(caps)
        b = budget
        while live and b > 0:
            capped_now = {
                g: c for g, c in live.items() if c * len(live) <= b
            }
            if capped_now:
                for g, c in capped_now.items():
                    alloc[g] = c
                    b -= c
                    del live[g]
                continue
            share, rem = b // len(live), b % len(live)
            order = sorted(live, key=lambda g: (caps[g], g))
            for i, g in enumerate(order):
                alloc[g] = share + (1 if i < rem else 0)
            b = 0
            live = {}
        return alloc

    def test_matches_brute_waterfill_skewed(self, spark):
        from olist_snowflake_dbt_spark.operators.sampling import (
            unimax_allocation,
        )

        # one giant group, mid groups, tiny groups -> capped prefix,
        # non-zero remainder
        sizes = {"en": 10_000, "fr": 900, "de": 850, "sw": 40, "yo": 7}
        rows = [(g, n) for g, n in sizes.items()]
        df = spark.createDataFrame(rows, "lang string, toks long")
        out = {
            r.lang: (r.alloc_tokens, r.capped, r.cap_tokens)
            for r in unimax_allocation(
                df, "lang", "toks", budget_num=1, budget_den=2, max_epochs=2
            ).collect()
        }
        budget = sum(sizes.values()) // 2  # 5898
        caps = {g: n * 2 for g, n in sizes.items()}
        ref = self._brute(caps, budget)
        assert {g: a for g, (a, _, _) in out.items()} == ref
        assert sum(a for a, _, _ in out.values()) == budget
        assert all(a <= c for a, _, c in out.values())
        # tiny groups capped at max_epochs, giant one waterfilled
        assert out["yo"][1] and out["sw"][1] and not out["en"][1]

    def test_budget_exceeding_corpus_caps_everything(self, spark):
        from olist_snowflake_dbt_spark.operators.sampling import (
            unimax_allocation,
        )

        df = spark.createDataFrame(
            [("a", 100), ("b", 50)], "lang string, toks long"
        )
        out = {
            r.lang: (r.alloc_tokens, r.capped, r.epochs_micro)
            for r in unimax_allocation(
                df, "lang", "toks", budget_num=10, budget_den=1, max_epochs=3
            ).collect()
        }
        # budget 1500 > total caps 450: every group trains max_epochs
        assert out == {
            "a": (300, True, 3_000_000),
            "b": (150, True, 3_000_000),
        }


class TestRankFusion:
    def test_matches_plain_window_fusion(self, spark):
        from olist_snowflake_dbt_spark.operators.sampling import rank_fusion

        rows = [
            (i, ((i * 37) % 23 - 11) * 10, ((i * 53) % 17) * 100)
            for i in range(120)
        ]
        df = spark.createDataFrame(rows, "doc_id long, q long, u long")
        got = {
            r.doc_id: (r.rank_q, r.rank_u, r.rank_sum, r.fused_rank)
            for r in rank_fusion(
                df, "doc_id", ["q", "u"],
                bucket_width={"q": 7, "u": 250},
            ).collect()
        }

        def ranks(key):
            order = sorted(rows, key=lambda r: (-key(r), r[0]))
            return {r[0]: i + 1 for i, r in enumerate(order)}

        rq, ru = ranks(lambda r: r[1]), ranks(lambda r: r[2])
        fused = sorted(rows, key=lambda r: (rq[r[0]] + ru[r[0]], r[0]))
        ff = {r[0]: i + 1 for i, r in enumerate(fused)}
        for i, _, _ in rows:
            assert got[i] == (rq[i], ru[i], rq[i] + ru[i], ff[i])

    def test_requires_scores(self, spark):
        import pytest as _pytest

        from olist_snowflake_dbt_spark.operators.sampling import rank_fusion

        df = spark.createDataFrame([(1, 2)], "doc_id long, q long")
        with _pytest.raises(ValueError, match="at least one"):
            rank_fusion(df, "doc_id", [])
