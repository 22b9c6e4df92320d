from __future__ import annotations

import zlib

import pytest
from pyspark.sql import functions as F

from olist_snowflake_dbt_spark.multimodal import (
    attach_fake_media,
    decode_media,
    extract_features,
    media_byte_stats,
    sample_frames,
)
from olist_snowflake_dbt_spark.sources.readers import read_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return attach_fake_media(read_table(spark, sf_dir, "documents")).cache()


def test_media_schema(media):
    fields = {f.name: f.dataType.simpleString() for f in media.schema.fields}
    assert fields["payload"] == "binary"
    assert fields["meta"].startswith("struct<media_type:string,fmt:string")


def test_byte_stats_match_jvm_recompute(spark, sf_dir, media):
    stats = media_byte_stats(media)
    docs = read_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.octet_length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
        F.md5(F.encode("text", "UTF-8")).alias("payload_md5"),
    )
    joined = stats.join(docs, "media_id", "inner").filter(
        (stats["n_bytes"] == docs["n_bytes"])
        & (stats["payload_md5"] == docs["payload_md5"])
    )
    assert joined.count() == media.count()


def test_decode_is_deterministic_and_complete(media):
    out1 = decode_media(media)
    assert out1.count() == media.count()
    row = out1.orderBy("media_id").first()
    # mean byte of UTF-8 text is within (0, 1) after /255 normalization
    assert 0.0 < row.mean_luma < 1.0
    # two runs produce identical results (stub decoder is deterministic)
    assert out1.exceptAll(decode_media(media)).count() == 0


def test_features_shape_and_norm(media):
    feats = extract_features(media, dim=8)
    r = feats.first()
    assert len(r.features) == 8
    assert abs(sum(r.features) - 1.0) < 1e-9  # normalized histogram


def test_frame_sample_geometry_and_crc(spark, media):
    frames = sample_frames(media, frame_bytes=1024, max_frames=8)
    # geometry: offsets stride by 1024, last frame may be short
    bad = frames.filter(
        (F.col("frame_offset") != F.col("frame_idx") * 1024)
        | (F.col("frame_nbytes") <= 0)
        | (F.col("frame_nbytes") > 1024)
    )
    assert bad.count() == 0
    # crc32 of one sampled frame matches a local recompute
    one = media.orderBy("media_id").first()
    f0 = (
        frames.filter(F.col("media_id") == one.media_id)
        .orderBy("frame_idx")
        .first()
    )
    assert f0.frame_crc32 == zlib.crc32(bytes(one.payload)[:1024])


def test_frame_counts(media):
    frames = sample_frames(media, frame_bytes=1024, max_frames=8)
    per = frames.groupBy("media_id").count()
    expected = media.select(
        "media_id",
        F.least(
            F.lit(8),
            F.greatest(F.lit(1), F.floor(F.octet_length("payload") / 1024)),
        ).alias("expected"),
    )
    mismatch = per.join(expected, "media_id").filter(
        F.col("count") != F.col("expected")
    )
    assert mismatch.count() == 0


class TestPerceptualHashDedup:
    """Perceptual-hash (dHash-style) media dedup: near-identical
    payloads must land within small Hamming distance; unrelated ones
    must not collide."""

    def test_planted_recall_and_precision(self, spark, sf_dir):
        from olist_snowflake_dbt_spark.multimodal import phash_pairs
        from olist_snowflake_dbt_spark.queries_multimodal import _planted_media

        pairs = phash_pairs(_planted_media(spark, sf_dir), max_hamming=3).cache()
        docs = read_table(spark, sf_dir, "documents")
        n_exact = docs.filter(F.col("doc_id") % 50 == 0).count()
        n_near = docs.filter(F.col("doc_id") % 70 == 0).count()
        # every planted EXACT copy is recovered at Hamming 0
        exact_found = pairs.filter(
            (F.col("id_b") - F.col("id_a") == 1000000) & (F.col("hamming") == 0)
        ).count()
        assert exact_found >= n_exact
        # every planted NEAR copy (3-char case flip, same length → only
        # grid cell 0 moves) is recovered within the Hamming budget
        near = pairs.filter(F.col("id_b") - F.col("id_a") == 2000000)
        assert near.count() == n_near
        # precision control: candidate pairs never exceed the Hamming cap
        assert pairs.filter(F.col("hamming") > 3).count() == 0

    def test_hash_is_brightness_invariant_but_content_sensitive(self, spark):
        """dHash compares ADJACENT cells, so adding a constant to every
        byte (global brightness shift) preserves the hash, while moving
        a block of bytes (content change) flips gradient bits."""
        from olist_snowflake_dbt_spark.multimodal.media import perceptual_hash

        base = bytes(range(40, 140)) * 10
        brighter = bytes(b + 40 for b in base)
        shuffled = base[::-1]  # reversed sawtooth → gradient signs flip
        df = spark.createDataFrame(
            [(1, base), (2, brighter), (3, shuffled)],
            "media_id long, payload binary",
        )
        sigs = {r.media_id: r.phash for r in perceptual_hash(df).collect()}
        ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
        assert ham(sigs[1], sigs[2]) <= 3  # brightness shift ≈ invariant
        assert ham(sigs[1], sigs[3]) > 3   # content move ≠ near-dup

    def test_empty_and_tiny_payloads(self, spark):
        from olist_snowflake_dbt_spark.multimodal.media import perceptual_hash

        df = spark.createDataFrame(
            [(1, b""), (2, b"ab"), (3, bytes(range(64)))],
            "media_id long, payload binary",
        )
        sigs = {r.media_id: r.phash for r in perceptual_hash(df).collect()}
        assert sigs[1] == 0                 # empty payload → zero hash
        assert 0 <= sigs[3] < (1 << 60)     # packed 60-bit range

    def test_incremental_admission(self, spark, sf_dir):
        """phash_incremental_admit: standing near-dups and within-batch
        smaller-id near-dups are rejected; genuinely new assets are
        admitted with their signature (the index append)."""
        from olist_snowflake_dbt_spark.multimodal import (
            attach_fake_media,
            phash_incremental_admit,
        )
        from olist_snowflake_dbt_spark.multimodal.media import perceptual_hash

        docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
        standing = perceptual_hash(
            attach_fake_media(docs.filter(F.col("doc_id") % 2 == 0))
        )
        resub = docs.filter(F.col("doc_id") % 50 == 0).withColumn(
            "doc_id", F.col("doc_id") + 1000000
        )
        dup_in_batch = docs.filter(F.col("doc_id") % 90 == 1).withColumn(
            "doc_id", F.col("doc_id") + 3000000
        )
        batch = (
            docs.filter(F.col("doc_id") % 2 == 1)
            .unionByName(resub)
            .unionByName(dup_in_batch)
        )
        admitted = {
            r.media_id
            for r in phash_incremental_admit(
                attach_fake_media(batch), standing
            ).collect()
        }
        # every re-submission of a standing asset is rejected
        assert not {r.doc_id + 1000000 for r in
                    docs.filter(F.col("doc_id") % 50 == 0).collect()} & admitted
        # every within-batch exact dup is blocked by its smaller-id twin
        assert not {r.doc_id + 3000000 for r in
                    docs.filter(F.col("doc_id") % 90 == 1).collect()} & admitted
        # and genuinely new content IS admitted (non-vacuous)
        assert admitted

    def test_banded_radius_guard_and_cache_release(self, spark):
        """max_hamming >= bands breaks the pigeonhole recall guarantee —
        both banded operators must reject it up front; and the
        persisted signature frames are released by the documented
        cache-lifetime hook."""
        import pytest

        from olist_snowflake_dbt_spark.multimodal import (
            attach_fake_media,
            phash_incremental_admit,
            phash_pairs,
        )
        from olist_snowflake_dbt_spark.multimodal import media as media_mod

        df = attach_fake_media(
            spark.createDataFrame(
                [(1, "alpha beta"), (2, "alpha beta")], "doc_id long, text string"
            )
        )
        with pytest.raises(ValueError, match="max_hamming"):
            phash_pairs(df, max_hamming=4, bands=4)
        with pytest.raises(ValueError, match="max_hamming"):
            phash_incremental_admit(
                df, media_mod.perceptual_hash(df), max_hamming=7, bands=4
            )

        media_mod.release_signature_caches()  # drop strays from other tests
        pairs = phash_pairs(df, max_hamming=3, bands=4)
        assert pairs.count() == 1
        tracked = list(media_mod._PERSISTED_SIGS)
        assert tracked and all(t.storageLevel.useMemory for t in tracked)
        media_mod.release_signature_caches()
        assert not media_mod._PERSISTED_SIGS
        assert not any(t.storageLevel.useMemory for t in tracked)

    def test_video_frame_pairs_recall_and_still_frame_control(self, spark):
        """video_phash_pairs: a tail-appended copy shares every full
        frame (recovered); a still video repeating ONE frame cannot
        pass the distinct-shared-frames threshold."""
        from olist_snowflake_dbt_spark.multimodal import video_phash_pairs

        base = bytes(range(64))
        # rotate per frame: the wrap edge MOVES, so gradient-sign hashes
        # differ frame-to-frame (a brightness shift would NOT — dHash is
        # invariant to it by design, which an earlier draft tripped over)
        moving = b"".join(
            base[9 * i % 64:] + base[: 9 * i % 64] for i in range(6)
        )
        trimmed_copy = moving + b"tail"     # same 6 leading frames
        still = base * 6                     # one repeated frame
        other = bytes(reversed(moving))
        df = spark.createDataFrame(
            [(1, moving), (2, trimmed_copy), (3, still), (4, other)],
            "media_id long, payload binary",
        )
        pairs = {
            (r.id_a, r.id_b): r.n_shared_frames
            for r in video_phash_pairs(
                df, frame_bytes=64, max_frames=8, min_shared=2
            ).collect()
        }
        assert pairs.get((1, 2), 0) >= 5   # the copy is found
        # the still video shares at most ONE distinct signature with
        # anything, so it never crosses the min_shared=2 vote
        assert not any(3 in k for k in pairs)
        assert (1, 4) not in pairs and (2, 4) not in pairs


def test_round9_plan_shapes_are_pinned(spark, sf_dir):
    """Exchange-count pins for the audited round-9 plans — a silent
    regression to a shuffle-heavier formulation fails here before it
    costs anything at scale."""
    expected = {
        # sig table + banded self-join (pair distinct rides the join key)
        "mm_phash_dedup": 2,
        # batch sigs + two banded rejection joins + admission anti-join
        "mm_phash_incremental": 4,
        # frame sigs, hot-frame guard agg+join, pair agg (+AQE reuse)
        "mm_video_phash_pairs": 11,
        # the full-PSL algorithm (round 11) adds one BROADCAST join per
        # (rule kind, width) — map-only by design, so this query pins
        # SHUFFLE exchanges instead: only the cap window repartitions
        "web_domain_psl": ("hash", 1),
        # the cap subtree is consumed by FOUR funnel branches (dedup
        # agg, gate join, per-stage audit aggregates) and since round
        # 13 carries TWO windows (salted two-phase top-k) AND persists
        # the two cap-bounded funnel frames. The PLAN TEXT prints each
        # persisted frame's cached plan once per REFERENCE (capped ×2,
        # blocked ×3 pre-AQE), so textual exchange counts are inflated
        # by duplication the runtime never executes — the cache
        # materializes each subtree once (asserted via
        # InMemoryTableScan below; measured 9.0 → 7.0 s at sf0.1 from
        # the persists). Blocklist + full-PSL lookups stay broadcast.
        "web_corpus_prep": ("hash", 14),
    }
    from olist_snowflake_dbt_spark.queries import QUERIES

    # earlier tests in this module cache() frames these queries share;
    # InMemoryRelation substitution would reshape the measured plans,
    # making the pins depend on test ORDER — measure the cold plan
    spark.catalog.clearCache()
    for name, n in expected.items():
        plan = (
            QUERIES[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        if isinstance(n, tuple):  # ("hash", k): pin only shuffle exchanges
            assert plan.count("Exchange hashpartitioning") <= n[1], (
                f"{name} grew: {plan}"
            )
        else:
            assert plan.count("Exchange") <= n, f"{name} grew: {plan}"
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan
        if name == "web_corpus_prep":
            # the funnel's persists must actually be consumed — the
            # exchange-count allowance above is only sound if the
            # duplicated subtrees read from cache at runtime
            assert "InMemoryTableScan" in plan, "funnel persist not consumed"


class TestAudioFingerprintDedup:
    """Haitsma-Kalker audio fingerprints: gain-invariance is EXACT (the
    double difference cancels constant offsets in integer arithmetic),
    planted copies are recovered, unrelated audio does not collide."""

    def test_gain_shift_invariance_is_exact(self, spark):
        """Adding a constant to every sample moves every cell mean by
        exactly 256*c, so band/time deltas — and the fingerprint — are
        bit-identical (not merely close, like dHash brightness)."""
        from olist_snowflake_dbt_spark.multimodal.media import (
            _afp60,
            audio_fingerprint,
        )

        base = bytes((17 * i) % 200 for i in range(1000))
        louder = bytes(b + 40 for b in base)      # +40 gain, no wrap
        reversed_ = base[::-1]                    # different content
        assert _afp60(base) == _afp60(louder)     # kernel-level, exact
        df = spark.createDataFrame(
            [(1, base), (2, louder), (3, reversed_)],
            "media_id long, payload binary",
        )
        sigs = {r.media_id: r.afp for r in audio_fingerprint(df).collect()}
        ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
        assert sigs[1] == sigs[2]                 # exact invariance
        assert ham(sigs[1], sigs[3]) > 3          # content move ≠ near-dup
        assert 0 <= sigs[1] < (1 << 60)           # packed 60-bit range
        assert _afp60(b"") == 0

    def test_planted_recall_and_radius_guard(self, spark, sf_dir):
        from olist_snowflake_dbt_spark.multimodal import audio_fp_pairs
        from olist_snowflake_dbt_spark.queries_multimodal import (
            q_mm_audio_fpdedup,
        )
        import pytest as _pt

        pairs = q_mm_audio_fpdedup(spark, sf_dir).cache()
        docs = read_table(spark, sf_dir, "documents")
        n_exact = docs.filter(
            (F.col("doc_id") % 3 == 1) & (F.col("doc_id") % 20 == 0)
        ).count()
        # every planted EXACT copy is recovered at Hamming 0
        exact_found = pairs.filter(
            (F.col("id_b") - F.col("id_a") == 3000000) & (F.col("hamming") == 0)
        ).count()
        assert exact_found >= n_exact > 0
        # near copies (3-char case flip → one frame-0 band delta moves)
        # appear within the Hamming budget; no pair exceeds the cap
        assert pairs.filter(F.col("hamming") > 3).count() == 0
        assert pairs.filter(F.col("id_b") - F.col("id_a") == 6000000).count() > 0
        # pigeonhole recall guarantee: radius >= bands is rejected
        media = spark.createDataFrame(
            [(1, b"x" * 100)], "media_id long, payload binary"
        )
        with _pt.raises(ValueError, match="max_hamming"):
            audio_fp_pairs(media, max_hamming=4, bands=4)


class TestResizeMedia:
    def _resize(self, spark, payloads, out_cells=4):
        from olist_snowflake_dbt_spark.multimodal import (
            attach_fake_media,
            resize_media,
        )

        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(payloads)],
            "doc_id long, text string",
        )
        return {
            r["media_id"]: r
            for r in resize_media(
                attach_fake_media(docs), out_cells=out_cells
            ).collect()
        }

    def test_block_means_exact(self, spark):
        # "AAAAbbbb" -> cells of 2 bytes: (65,65),(65,65)... wait 8
        # bytes over 4 cells = 2 each: 41,41 | 41,42? text 'AAAAbbbb'
        got = self._resize(spark, ["AAAAbbbb"])[0]
        # bytes: 65*4, 98*4 -> cells: [65,65,98,98] -> hex 41 41 62 62
        assert got["resized_hex"] == "41416262"
        assert got["n_bytes"] == 8

    def test_short_payload_pads_with_zero_cells(self, spark):
        got = self._resize(spark, ["AB"], out_cells=4)[0]
        # 2 bytes over 4 cells: byte0 -> cell0, byte1 -> cell2
        assert got["resized_hex"] == "41004200"

    def test_empty_payload_all_zero(self, spark):
        got = self._resize(spark, [""], out_cells=4)[0]
        assert got["resized_hex"] == "00000000"

    def test_identical_payloads_identical_grids(self, spark):
        got = self._resize(spark, ["same text here", "same text here"])
        assert got[0]["resized_hex"] == got[1]["resized_hex"]

    def test_guard(self, spark):
        import pytest as _pytest

        from olist_snowflake_dbt_spark.multimodal import (
            attach_fake_media,
            resize_media,
        )

        docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with _pytest.raises(ValueError, match="out_cells"):
            resize_media(attach_fake_media(docs), out_cells=0)
