"""Skew-stress tests for the one-exchange sequence kernels (VERDICT
r10 #7): a zipfian user owning a large share of all events puts one
giant partition through the lag-window / Arrow-NFA scan. These tests
pin (a) EXACTNESS under that skew — hot-key results equal a Python
reference computed on the same fixture, so the kernel cannot silently
truncate, re-order, or split the hot group — (b) the one-exchange plan
shape (no extra shuffle amplifying the hot key), and (c) an existence
proof that a six-figure single-key group flows through the NFA kernel
(linear per-row work: the kernel scans each row once; a quadratic
regression would time this out).

What skew CANNOT do here (documented, not hidden): a groupBy/window
partition is a unit — AQE skew-split cannot divide one key's rows
across tasks, so a user holding p% of a 100 TB corpus puts p% through
one task. The mitigation is the kernels' LINEAR per-row work plus
upstream horizon bounding (sessionization / date partitioning), not
partition splitting.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

HOT_N = 6_000          # hot-user events (cyclic view->click->purchase)
COLD_USERS = 150
COLD_N = 20            # per cold user

_CYCLE = ["view", "click", "purchase"]


def _fixture_rows():
    rows = []
    for i in range(HOT_N):
        rows.append((0, i, _CYCLE[i % 3]))
    for u in range(1, COLD_USERS + 1):
        for i in range(COLD_N):
            # cold users: view,view,click,view,... sparse purchases
            et = "purchase" if i % 7 == 6 else ("click" if i % 3 == 2 else "view")
            rows.append((u, i, et))
    return rows


@pytest.fixture(scope="module")
def events(spark):
    return spark.createDataFrame(
        _fixture_rows(), "user_id long, seq long, event_type string"
    )


def test_fixture_is_skewed(events):
    by_user = events.groupBy("user_id").count().collect()
    counts = {r["user_id"]: r["count"] for r in by_user}
    # the hot user owns ~2/3 of all events — far beyond any balanced split
    assert counts[0] == HOT_N
    assert counts[0] > 10 * max(v for k, v in counts.items() if k != 0)


def test_transition_matrix_exact_under_skew(spark, events):
    from olist_snowflake_dbt_spark.operators.sequence import (
        transition_matrix,
    )

    got = {
        (r.src_state, r.dst_state): r.n_trans
        for r in transition_matrix(
            events, "user_id", ["seq"], "event_type"
        ).collect()
    }
    want: Counter = Counter()
    seqs: dict[int, list[str]] = {}
    for u, i, et in _fixture_rows():
        seqs.setdefault(u, []).append((i, et))
    for u, evs in seqs.items():
        evs = [et for _, et in sorted(evs)]
        for a, b in zip(evs, evs[1:]):
            want[(a, b)] += 1
    assert got == dict(want)


def test_match_recognize_exact_and_one_exchange_under_skew(spark, events):
    from olist_snowflake_dbt_spark.operators.match_recognize import (
        match_recognize,
    )

    out = match_recognize(
        events,
        partition_by="user_id",
        order_by="seq",
        pattern="V C P",
        define={
            "V": F.col("event_type") == "view",
            "C": F.col("event_type") == "click",
            "P": F.col("event_type") == "purchase",
        },
        measures=[("count", "*", "seq", "n")],
    )
    plan = (
        out._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    # ONE data-sized shuffle: the groupBy feeding the Arrow kernel
    assert plan.count("- Exchange") == 1, plan
    rows = out.collect()
    per_user = Counter(r["user_id"] for r in rows)
    # hot user: the cycle IS the pattern -> one match per 3 events
    assert per_user[0] == HOT_N // 3
    # cold users: seq 0..19 -> pattern needs view,click,purchase adjacent;
    # positions (4,5,6) and (11,12,13*)? compute via the same reference
    import re

    def ref_matches(ets):
        s = "".join(
            {"view": "V", "click": "C", "purchase": "P"}[e] for e in ets
        )
        return len(re.findall("VCP", s))

    seqs: dict[int, list] = {}
    for u, i, et in _fixture_rows():
        seqs.setdefault(u, []).append((i, et))
    for u, evs in seqs.items():
        ets = [et for _, et in sorted(evs)]
        assert per_user.get(u, 0) == ref_matches(ets), u


def test_nfa_kernel_linear_existence_six_figure_group(spark):
    """300k rows in ONE key through the NFA kernel — completes in
    seconds because per-row work is O(1) (one regex scan over one
    codepoint per row). A quadratic kernel regression would blow this
    up to ~10^10 operations and time the suite out."""
    from olist_snowflake_dbt_spark.operators.match_recognize import (
        match_recognize,
    )

    n = 300_000
    df = spark.range(n).select(
        F.lit(1).alias("k"),
        F.col("id").alias("seq"),
        F.when(F.col("id") % 3 == 2, "purchase")
        .when(F.col("id") % 3 == 1, "click")
        .otherwise("view")
        .alias("event_type"),
    )
    out = match_recognize(
        df,
        partition_by="k",
        order_by="seq",
        pattern="V C P",
        define={
            "V": F.col("event_type") == "view",
            "C": F.col("event_type") == "click",
            "P": F.col("event_type") == "purchase",
        },
    )
    assert out.count() == n // 3
