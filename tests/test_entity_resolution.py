"""Entity resolution (operators/entity_resolution.py): blocking,
bounded matching, transitive clustering, survivorship."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olist_snowflake_dbt_spark.operators.entity_resolution import (
    candidate_pairs,
    golden_records,
    resolve_entities,
)


def _records(spark, rows):
    return spark.createDataFrame(rows, "id bigint, name string, score int")


class TestCandidatePairs:
    def test_blocked_match_within_distance(self, spark):
        recs = _records(
            spark,
            [(1, "acme corp 001", 5), (2, "acme corp 001", 7), (3, "zenith 001", 1)],
        )
        pairs = candidate_pairs(
            recs, "id", "name", F.substring("name", -3, 3), max_dist=2
        ).collect()
        # 1~2 exact dup; 3 shares the block but is >2 edits away
        assert [(p.id_a, p.id_b, p.edit_distance) for p in pairs] == [(1, 2, 0)]

    def test_blocking_prevents_cross_block_compare(self, spark):
        recs = _records(spark, [(1, "alpha 001", 0), (2, "alpha 002", 0)])
        pairs = candidate_pairs(
            recs, "id", "name", F.substring("name", -3, 3), max_dist=2
        )
        assert pairs.count() == 0  # 1 edit apart but different blocks

    def test_normalization_absorbs_case_and_whitespace(self, spark):
        recs = _records(spark, [(1, "Acme  Corp x01", 0), (2, "acme corp x01", 0)])
        pairs = candidate_pairs(
            recs, "id", "name", F.substring("name", -3, 3), max_dist=2
        ).collect()
        assert [(p.id_a, p.id_b, p.edit_distance) for p in pairs] == [(1, 2, 0)]


class TestGoldenRecords:
    def test_transitive_chain_merges_beyond_pairwise_threshold(self, spark):
        """A~B (1 edit) and B~C (1 edit) but A vs C = 2 edits from A..C
        chains through B even when endpoints never matched directly —
        the property the within-pair SQL shortcut cannot express."""
        recs = _records(
            spark,
            [(1, "abcdef 001", 10), (2, "abcdxf 001", 20), (3, "abgdxf 001", 30)],
        )
        out = resolve_entities(
            recs, "id", "name", F.substring("name", -3, 3),
            {"best": ("score", "max"), "nm": ("name", "canonical")},
            max_dist=1,
        ).collect()
        assert len(out) == 1
        row = out[0]
        assert (row.entity_id, row.n_members, row.best, row.nm) == (
            1, 3, 30, "abcdef 001",
        )

    def test_singletons_survive_as_entities(self, spark):
        recs = _records(spark, [(5, "solo 001", 2)])
        out = resolve_entities(
            recs, "id", "name", F.substring("name", -3, 3),
            {"nm": ("name", "canonical")},
        ).collect()
        assert [(r.entity_id, r.n_members, r.nm) for r in out] == [(5, 1, "solo 001")]

    def test_min_policy_and_unknown_policy(self, spark):
        recs = _records(spark, [(1, "dup 001", 9), (2, "dup 001", 3)])
        pairs = candidate_pairs(recs, "id", "name", F.substring("name", -3, 3))
        out = golden_records(recs, pairs, "id", {"lo": ("score", "min")}).collect()
        assert [(r.entity_id, r.lo) for r in out] == [(1, 3)]
        with pytest.raises(ValueError, match="survivorship"):
            golden_records(recs, pairs, "id", {"x": ("score", "median")}).collect()
