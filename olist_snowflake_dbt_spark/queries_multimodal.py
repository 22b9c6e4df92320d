"""Driver queries for the multimodal (binary media column) surface.

The payloads are deterministic (UTF-8 bytes of the documents' text), so
byte-level results are oracle-checkable in DuckDB: the byte-stats query
matches md5/octet_length over the encoded text, and the frame-sample
fan-out matches a generate_series reconstruction of the slice geometry.
The decode/feature kernels return deterministic fakes (no codecs in the
container); their byte-exact determinism is what makes even decode and
feature extraction oracle-checkable (hex-reconstruction twins below).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .multimodal import (
    attach_fake_media,
    decode_media,
    extract_features,
    media_byte_stats,
    phash_pairs,
    resize_media,
    sample_frames,
)
from .queries import _t, query


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return attach_fake_media(_t(spark, sf_dir, "documents"))


@query(
    "mm_byte_stats",
    """
    SELECT doc_id AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                           ELSE 'video' END AS media_type,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS payload_md5
    FROM documents
    """,
)
def q_mm_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column accounting without decode: JVM-side octet_length /
    md5 over the payload (multimodal/media.media_byte_stats). crc32 is
    dropped from the oracle projection (DuckDB lacks crc32)."""
    return media_byte_stats(_media(spark, sf_dir)).drop("payload_crc32")


@query(
    "mm_frame_sample",
    """
    WITH m AS (
        SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes
        FROM documents
    ),
    f AS (
        SELECT media_id, n_bytes,
               UNNEST(generate_series(0, CAST(least(8, greatest(1, n_bytes // 64)) AS INT) - 1))
                   AS frame_idx
        FROM m
    )
    SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
           CAST(frame_idx * 64 AS BIGINT) AS frame_offset,
           CAST(least(64, n_bytes - frame_idx * 64) AS BIGINT) AS frame_nbytes
    FROM f
    """,
)
def q_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling fan-out (mapInPandas, executor-side row
    explosion): slice geometry is integer-exact, so the oracle
    reconstructs it with generate_series; the crc32 column is asserted
    in pytest instead (DuckDB lacks crc32)."""
    return sample_frames(_media(spark, sf_dir), frame_bytes=64).drop("frame_crc32")


@query(
    "mm_decode",
    """
    WITH m AS (
        SELECT doc_id AS media_id,
               CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                               ELSE 'video' END AS media_type,
               hex(encode(text)) AS hx,
               octet_length(encode(text)) AS n
        FROM documents
    ),
    chars AS (  -- byte i = 16*hex[2i+1] + hex[2i+2] (1-based hex string)
        SELECT media_id,
               strpos('0123456789ABCDEF', substr(hx, CAST(i AS BIGINT), 1)) - 1
                   AS v,
               CASE WHEN i % 2 = 1 THEN 16 ELSE 1 END AS w
        FROM (SELECT media_id, hx, UNNEST(generate_series(1, 2 * n)) AS i FROM m)
    ),
    sums AS (SELECT media_id, SUM(v * w) AS s FROM chars GROUP BY media_id)
    SELECT m.media_id, m.media_type,
           CAST(CASE WHEN m.media_type = 'audio' THEN 0
                     ELSE m.n % 1024 + 16 END AS INT) AS decoded_w,
           CAST(CASE WHEN m.media_type = 'audio' THEN 0
                     ELSE m.n % 768 + 16 END AS INT) AS decoded_h,
           CASE WHEN m.n = 0 THEN 0.0
                ELSE CAST(s.s AS DOUBLE) / m.n / 255.0 END AS mean_luma
    FROM m LEFT JOIN sums s USING (media_id)
    """,
)
def q_mm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched media decode through the stubbed codec (mapInPandas —
    Arrow in/out): dimensions from metadata + mean-byte luminance.
    Deterministic, so the DuckDB twin reconstructs it byte-exactly from
    hex(payload): mean_luma = sum(bytes)/n/255 with the same int-exact
    sums and identically-rounded double divisions; decoded_w/h replay
    attach_fake_media's metadata arithmetic (audio has no dimensions →
    the kernel's `width or 0` fallback)."""
    return decode_media(_media(spark, sf_dir))


@query(
    "mm_features",
    """
    WITH m AS (
        SELECT doc_id AS media_id,
               hex(encode(text)) AS hx,
               octet_length(encode(text)) AS n
        FROM documents
    ),
    b AS (  -- bucket = byte // 32 = (high hex digit) // 2, so only the
            -- first hex char of each byte is needed
        SELECT media_id, n,
               (strpos('0123456789ABCDEF',
                       substr(hx, CAST(2 * i + 1 AS BIGINT), 1)) - 1) // 2 AS bucket
        FROM (SELECT media_id, n, hx, UNNEST(generate_series(0, n - 1)) AS i FROM m)
    ),
    counts AS (
        SELECT media_id, bucket, COUNT(*) AS cnt FROM b GROUP BY media_id, bucket
    )
    SELECT m.media_id,
           CAST(d.dim_idx AS INT) AS dim_idx,
           CASE WHEN m.n = 0 THEN 0.0
                ELSE COALESCE(c.cnt, 0) / m.n END AS feature_value
    FROM m CROSS JOIN (SELECT UNNEST(generate_series(0, 7)) AS dim_idx) d
    LEFT JOIN counts c ON c.media_id = m.media_id AND c.bucket = d.dim_idx
    """,
)
def q_mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-dim feature extraction from payload bytes (normalized byte
    histogram) — the embedding-stage batch shape, deterministic.
    The array<double> vector is posexploded to long format
    (media_id, dim_idx, feature_value): raw array cells are unhashable
    in the driver's pandas canonicalizer (they abort the whole run),
    and the long form is exactly what a DuckDB twin can recompute."""
    feats = extract_features(_media(spark, sf_dir))
    return feats.select(
        "media_id", F.posexplode("features").alias("dim_idx", "feature_value")
    )


# Perceptual-hash dedup twin: bytes from hex(payload) → 64-cell grid of
# integer-scaled means ((256*sum)//len) → 60 dHash gradient-sign bits →
# packed BIGINT → 4×15-bit pigeonhole bands → bit_count Hamming ≤ 3.
# Every step is integer arithmetic, so the replay is bit-exact.
_PH_NBITS, _PH_BANDS, _PH_CELLS = 60, 4, 64
_PH_WIDTH = _PH_NBITS // _PH_BANDS
# Planted dup structure (both engines build it identically): every 50th
# doc gets an EXACT byte copy (Hamming 0) and every 70th a NEAR copy —
# first three characters uppercased, same length, so only grid cell 0's
# value moves and the phash drifts by ≤ a couple of gradient bits.
_PLANTED_MEDIA = """
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 50 = 0
    UNION ALL
    SELECT doc_id + 2000000,
           upper(substr(text, 1, 3)) || substr(text, 4)
    FROM documents WHERE doc_id % 70 = 0
"""
_PHASH_SIG_TAIL = f"""
    m AS (
        SELECT doc_id AS media_id,
               hex(encode(text)) AS hx,
               octet_length(encode(text)) AS n
        FROM d2
    ),
    bytes AS (  -- byte i (0-based) = 16*hex[2i+1] + hex[2i+2]
        SELECT media_id, n,
               ((strpos('0123456789ABCDEF',
                        substr(hx, CAST(2 * i + 1 AS BIGINT), 1)) - 1) * 16
                + strpos('0123456789ABCDEF',
                         substr(hx, CAST(2 * i + 2 AS BIGINT), 1)) - 1) AS v,
               (i * {_PH_CELLS}) // n AS k
        FROM (SELECT media_id, n, hx, UNNEST(generate_series(0, n - 1)) AS i
              FROM m WHERE n > 0)
    ),
    cells AS (
        SELECT media_id, k, SUM(v) AS s, COUNT(*) AS c
        FROM bytes GROUP BY media_id, k
    ),
    grid AS (  -- all 64 cells per asset; empty segments (tiny payloads)
               -- and empty payloads contribute value 0, like the kernel
        SELECT m.media_id, gs.k,
               CAST(CASE WHEN c.c > 0 THEN (256 * c.s) // c.c
                         ELSE 0 END AS BIGINT) AS val
        FROM m
        CROSS JOIN (SELECT UNNEST(generate_series(0, {_PH_CELLS - 1})) AS k) gs
        LEFT JOIN cells c ON c.media_id = m.media_id AND c.k = gs.k
    ),
    bits AS (  -- dHash: bit (row*15 + col) = cell < its right neighbor
        SELECT a.media_id,
               CAST((a.k // 16) * 15 + (a.k % 16) AS INT) AS b,
               CASE WHEN a.val < r.val THEN 1 ELSE 0 END AS bit
        FROM grid a
        JOIN grid r ON r.media_id = a.media_id AND r.k = a.k + 1
        WHERE a.k % 16 < 15
    ),
    sig AS (
        SELECT media_id,
               CAST(SUM(CAST(bit AS BIGINT) * (CAST(1 AS BIGINT) << b))
                    AS BIGINT) AS phash
        FROM bits GROUP BY media_id
    ),
    banded AS (
        SELECT media_id, phash,
               ((phash >> (bnd * {_PH_WIDTH})) & {(1 << _PH_WIDTH) - 1})
                   | (bnd << {_PH_WIDTH}) AS band
        FROM sig, (SELECT UNNEST(generate_series(0, {_PH_BANDS - 1})) AS bnd)
    )
"""


def _phash_sig_sql(docs_sql: str) -> str:
    """WITH-prefix computing ``sig(media_id, phash)`` + ``banded`` from
    any docs CTE body — shared by the pair and incremental oracles so
    the hash replay has ONE source of truth."""
    return f"WITH d2 AS ({docs_sql}),{_PHASH_SIG_TAIL}"


_PHASH_ORACLE = (
    _phash_sig_sql(_PLANTED_MEDIA)
    + f"""
    SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
           bit_count(xor(a.phash, b.phash)) AS hamming
    FROM banded a JOIN banded b ON a.band = b.band AND a.media_id < b.media_id
    WHERE bit_count(xor(a.phash, b.phash)) <= 3
"""
)


def _planted_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The _PLANTED_MEDIA CTE, Spark-side: exact copies (%50) and
    same-length 3-char-uppercase near copies (%70) of the documents,
    run through the media synthesizer."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    exact = docs.filter(F.col("doc_id") % 50 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    near = (
        docs.filter(F.col("doc_id") % 70 == 0)
        .withColumn(
            "text",
            F.concat(
                F.upper(F.substring("text", 1, 3)),
                F.expr("substring(text, 4)"),
            ),
        )
        .withColumn("doc_id", F.col("doc_id") + 2000000)
    )
    return attach_fake_media(docs.unionByName(exact).unionByName(near))


@query("mm_phash_dedup", _PHASH_ORACLE)
def q_mm_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash media dedup — the media member of the dedup
    family (multimodal/media.perceptual_hash + phash_pairs): one
    Arrow-batched map pass packs each payload's dHash gradient signs
    into an int64, then the banded pigeonhole self-join (simhash
    machinery reused) yields near-dup pairs at Hamming ≤ 3. All-integer
    arithmetic end-to-end, so the DuckDB twin replays the hash and the
    pair set bit-exactly from hex(payload). Planted exact + near
    copies guarantee the result is non-vacuous at every sf."""
    return phash_pairs(_planted_media(spark, sf_dir), max_hamming=3, bands=4)


# Incremental admission twin: standing corpus = even doc_ids (< 1e6);
# the batch = odd originals + planted re-submissions of standing assets
# (+1e6 exact, +2e6 near for %70 even bases — both must be REJECTED
# against the standing index) + planted within-batch exact dups (+3e6,
# only the smaller id survives). The union runs through the shared sig
# pipeline once; sides are split by id predicate in the tail.
_INCR_MEDIA = """
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 50 = 0
    UNION ALL
    SELECT doc_id + 2000000,
           upper(substr(text, 1, 3)) || substr(text, 4)
    FROM documents WHERE doc_id % 70 = 0
    UNION ALL
    SELECT doc_id + 3000000, text FROM documents WHERE doc_id % 90 = 1
"""
_PHASH_INCR_ORACLE = (
    _phash_sig_sql(_INCR_MEDIA)
    + """
    , std AS (
        SELECT * FROM banded WHERE media_id % 2 = 0 AND media_id < 1000000
    ),
    bat AS (
        SELECT * FROM banded
        WHERE NOT (media_id % 2 = 0 AND media_id < 1000000)
    ),
    rej AS (
        SELECT DISTINCT b.media_id
        FROM bat b JOIN std s
          ON b.band = s.band AND bit_count(xor(b.phash, s.phash)) <= 3
        UNION
        SELECT DISTINCT b.media_id
        FROM bat b JOIN bat a
          ON a.band = b.band AND a.media_id < b.media_id
             AND bit_count(xor(a.phash, b.phash)) <= 3
    )
    SELECT media_id, phash FROM sig
    WHERE NOT (media_id % 2 = 0 AND media_id < 1000000)
      AND media_id NOT IN (SELECT media_id FROM rej)
"""
)


@query("mm_phash_incremental", _PHASH_INCR_ORACLE)
def q_mm_phash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental media-corpus admission
    (multimodal/media.phash_incremental_admit): the standing corpus
    (even doc_ids) exists ONLY as its 8-byte signature table; the
    incoming batch — genuinely-new odd assets, planted re-submissions
    of standing assets (exact and 3-char-case near copies, rejected by
    the banded join against the index), and planted within-batch dups
    (smaller id blocks) — pays one Arrow hash pass and two pigeonhole
    joins. Returns the admitted (media_id, phash) rows, i.e. the index
    append. The corpus is never re-decoded as it grows."""
    from .multimodal import phash_incremental_admit
    from .multimodal.media import perceptual_hash

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    standing = perceptual_hash(
        attach_fake_media(docs.filter(F.col("doc_id") % 2 == 0))
    )
    resub = docs.filter(F.col("doc_id") % 50 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    near = (
        docs.filter(F.col("doc_id") % 70 == 0)
        .withColumn(
            "text",
            F.concat(
                F.upper(F.substring("text", 1, 3)),
                F.expr("substring(text, 4)"),
            ),
        )
        .withColumn("doc_id", F.col("doc_id") + 2000000)
    )
    batch_dup = docs.filter(F.col("doc_id") % 90 == 1).withColumn(
        "doc_id", F.col("doc_id") + 3000000
    )
    batch = (
        docs.filter(F.col("doc_id") % 2 == 1)
        .unionByName(resub)
        .unionByName(near)
        .unionByName(batch_dup)
    )
    return phash_incremental_admit(attach_fake_media(batch), standing)


# Video near-dup twin: per-FRAME dHash over 64-byte slices (the
# sample_frames geometry), then an exact-signature inverted-index join
# — pairs sharing >= 2 distinct frame hashes. Frame = 64 bytes with a
# 64-cell grid, so each cell is one byte and the gradient bits compare
# adjacent bytes; every step is integer arithmetic, replayed from
# hex(payload). Planted copies append a tail ("trailing credits"), so
# every full frame of the original survives verbatim in the copy.
_VIDEO_MEDIA = """
    SELECT doc_id, text FROM documents WHERE n_chars >= 256
    UNION ALL
    SELECT doc_id + 1000000, text || ' trailing-credits'
    FROM documents WHERE n_chars >= 256 AND doc_id % 3 = 0
"""
_VIDEO_PHASH_ORACLE = f"""
    WITH d2 AS ({_VIDEO_MEDIA}),
    m AS (
        SELECT doc_id AS media_id,
               hex(encode(text)) AS hx,
               octet_length(encode(text)) AS n
        FROM d2
    ),
    f AS (
        SELECT media_id, hx, n, CAST(fi AS INT) AS frame_idx,
               fi * 64 AS off, least(64, n - fi * 64) AS flen
        FROM (SELECT media_id, hx, n,
                     UNNEST(generate_series(
                         0, CAST(least(8, greatest(1, n // 64)) AS INT) - 1))
                         AS fi
              FROM m)
    ),
    bytes AS (  -- frame-LOCAL byte i; global offset off+i into the hex
        SELECT media_id, frame_idx, flen,
               ((strpos('0123456789ABCDEF',
                        substr(hx, CAST(2 * (off + i) + 1 AS BIGINT), 1)) - 1) * 16
                + strpos('0123456789ABCDEF',
                         substr(hx, CAST(2 * (off + i) + 2 AS BIGINT), 1)) - 1) AS v,
               (i * 64) // flen AS k
        FROM (SELECT media_id, frame_idx, off, flen, hx,
                     UNNEST(generate_series(0, flen - 1)) AS i
              FROM f WHERE flen > 0)
    ),
    cells AS (
        SELECT media_id, frame_idx, k, SUM(v) AS s, COUNT(*) AS c
        FROM bytes GROUP BY media_id, frame_idx, k
    ),
    grid AS (
        SELECT f.media_id, f.frame_idx, gs.k,
               CAST(CASE WHEN c.c > 0 THEN (256 * c.s) // c.c
                         ELSE 0 END AS BIGINT) AS val
        FROM f
        CROSS JOIN (SELECT UNNEST(generate_series(0, 63)) AS k) gs
        LEFT JOIN cells c ON c.media_id = f.media_id
                         AND c.frame_idx = f.frame_idx AND c.k = gs.k
    ),
    bits AS (
        SELECT a.media_id, a.frame_idx,
               CAST((a.k // 16) * 15 + (a.k % 16) AS INT) AS b,
               CASE WHEN a.val < r.val THEN 1 ELSE 0 END AS bit
        FROM grid a
        JOIN grid r ON r.media_id = a.media_id
                   AND r.frame_idx = a.frame_idx AND r.k = a.k + 1
        WHERE a.k % 16 < 15
    ),
    sig AS (
        SELECT media_id, frame_idx,
               CAST(SUM(CAST(bit AS BIGINT) * (CAST(1 AS BIGINT) << b))
                    AS BIGINT) AS phash
        FROM bits GROUP BY media_id, frame_idx
    ),
    fp0 AS (SELECT DISTINCT media_id, phash FROM sig),
    fp AS (  -- hot-frame guard (max_sig_freq=50): drop ubiquitous sigs
        SELECT fp0.media_id, fp0.phash
        FROM fp0 JOIN (SELECT phash FROM fp0
                       GROUP BY phash HAVING COUNT(*) <= 50) ok
        USING (phash)
    )
    SELECT a.media_id AS id_a, b.media_id AS id_b,
           COUNT(DISTINCT a.phash) AS n_shared_frames
    FROM fp a JOIN fp b ON a.phash = b.phash AND a.media_id < b.media_id
    GROUP BY 1, 2 HAVING COUNT(DISTINCT a.phash) >= 2
"""


@query("mm_video_phash_pairs", _VIDEO_PHASH_ORACLE)
def q_mm_video_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-dup detection (multimodal/media.frame_phashes +
    video_phash_pairs): per-frame perceptual hashes computed inside ONE
    Arrow pass (frame bytes never leave the executor — only 8-byte
    signatures do), then an exact-signature inverted-index self-join
    votes pairs sharing ≥ 2 DISTINCT frame hashes. Planted copies with
    an appended tail keep every full frame verbatim, so recall is
    guaranteed by construction; the distinct-count vote stops a
    repeated still frame from faking the threshold."""
    from .multimodal import video_phash_pairs

    docs = _t(spark, sf_dir, "documents")
    base = docs.filter(F.col("n_chars") >= 256).select("doc_id", "text")
    dup = (
        base.filter(F.col("doc_id") % 3 == 0)
        .withColumn("text", F.concat(F.col("text"), F.lit(" trailing-credits")))
        .withColumn("doc_id", F.col("doc_id") + 1000000)
    )
    media = attach_fake_media(base.unionByName(dup))
    return video_phash_pairs(
        media, frame_bytes=64, max_frames=8, min_shared=2, max_sig_freq=50
    )


# Audio-fingerprint twin: bytes from hex(payload) → 78-cell (13 time
# frames × 6 bands, time-major) grid of integer-scaled means → 60
# Haitsma-Kalker double-difference sign bits (bit (t-1)*5+b =
# [E(t,b)-E(t,b+1)] - [E(t-1,b)-E(t-1,b+1)] > 0) → packed BIGINT →
# 4×15-bit pigeonhole bands → bit_count Hamming ≤ 3. All-integer, so
# the replay is bit-exact. Planted structure: the audio assets
# (doc_id % 3 = 1) get an EXACT copy every 20th (+3e6; Hamming 0) and
# a 3-char-uppercase NEAR copy every ≡10 mod 30 (+6e6; both offsets
# ≡ 0 mod 3, so every planted row stays an audio asset).
_AUDIO_FP_ORACLE = """
WITH d2 AS (
    SELECT doc_id, text FROM documents WHERE doc_id % 3 = 1
    UNION ALL
    SELECT doc_id + 3000000, text FROM documents
    WHERE doc_id % 3 = 1 AND doc_id % 20 = 0
    UNION ALL
    SELECT doc_id + 6000000,
           upper(substr(text, 1, 3)) || substr(text, 4)
    FROM documents WHERE doc_id % 30 = 10
),
m AS (
    SELECT doc_id AS media_id,
           hex(encode(text)) AS hx,
           octet_length(encode(text)) AS n
    FROM d2
),
bytes AS (  -- byte i (0-based) = 16*hex[2i+1] + hex[2i+2]
    SELECT media_id, n,
           ((strpos('0123456789ABCDEF',
                    substr(hx, CAST(2 * i + 1 AS BIGINT), 1)) - 1) * 16
            + strpos('0123456789ABCDEF',
                     substr(hx, CAST(2 * i + 2 AS BIGINT), 1)) - 1) AS v,
           (i * 78) // n AS k
    FROM (SELECT media_id, n, hx, UNNEST(generate_series(0, n - 1)) AS i
          FROM m WHERE n > 0)
),
cells AS (
    SELECT media_id, k, SUM(v) AS s, COUNT(*) AS c
    FROM bytes GROUP BY media_id, k
),
grid AS (  -- all 78 cells; empty segments contribute value 0
    SELECT m.media_id, gs.k,
           CAST(CASE WHEN c.c > 0 THEN (256 * c.s) // c.c
                     ELSE 0 END AS BIGINT) AS val
    FROM m
    CROSS JOIN (SELECT UNNEST(generate_series(0, 77)) AS k) gs
    LEFT JOIN cells c ON c.media_id = m.media_id AND c.k = gs.k
),
bd AS (  -- band delta d(t,b) = E[t,b] - E[t,b+1]
    SELECT a.media_id, a.k // 6 AS t, a.k % 6 AS b, a.val - r.val AS d
    FROM grid a JOIN grid r ON r.media_id = a.media_id AND r.k = a.k + 1
    WHERE a.k % 6 < 5
),
bits AS (  -- time double-difference sign, bit index (t-1)*5 + b
    SELECT cur.media_id, CAST((cur.t - 1) * 5 + cur.b AS INT) AS bit_i,
           CASE WHEN cur.d - prv.d > 0 THEN 1 ELSE 0 END AS bit
    FROM bd cur
    JOIN bd prv ON prv.media_id = cur.media_id
               AND prv.t = cur.t - 1 AND prv.b = cur.b
),
sig AS (
    SELECT media_id,
           CAST(SUM(CAST(bit AS BIGINT) * (CAST(1 AS BIGINT) << bit_i))
                AS BIGINT) AS afp
    FROM bits GROUP BY media_id
),
banded AS (
    SELECT media_id, afp,
           ((afp >> (bnd * 15)) & 32767) | (bnd << 15) AS band
    FROM sig, (SELECT UNNEST(generate_series(0, 3)) AS bnd)
)
SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
       bit_count(xor(a.afp, b.afp)) AS hamming
FROM banded a JOIN banded b ON a.band = b.band AND a.media_id < b.media_id
WHERE bit_count(xor(a.afp, b.afp)) <= 3
"""


@query("mm_audio_fpdedup", _AUDIO_FP_ORACLE)
def q_mm_audio_fpdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup detection — the audio member of the multimodal
    dedup triad (image mm_phash_dedup, video mm_video_phash_pairs):
    Haitsma-Kalker band-energy double-difference fingerprints
    (multimodal/media.audio_fingerprint, gain-shift invariant by
    construction) packed into int64, then the banded pigeonhole
    self-join at Hamming ≤ 3. One Arrow map pass over the payloads;
    every later stage moves only 16-byte signatures. All-integer
    arithmetic end-to-end — the DuckDB twin replays fingerprints and
    the pair set bit-exactly from hex(payload). Planted exact + near
    copies keep the result non-vacuous at every sf."""
    from .multimodal import audio_fp_pairs

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") % 3 == 1)
    exact = base.filter(F.col("doc_id") % 20 == 0).withColumn(
        "doc_id", F.col("doc_id") + 3000000
    )
    near = (
        docs.filter(F.col("doc_id") % 30 == 10)
        .withColumn(
            "text",
            F.concat(
                F.upper(F.substring("text", 1, 3)),
                F.expr("substring(text, 4)"),
            ),
        )
        .withColumn("doc_id", F.col("doc_id") + 6000000)
    )
    media = attach_fake_media(base.unionByName(exact).unionByName(near))
    return audio_fp_pairs(media, max_hamming=3, bands=4)


_RESIZE_ORACLE = """
WITH m AS (
    SELECT doc_id AS media_id,
           hex(encode(text)) AS hx,
           octet_length(encode(text)) AS n
    FROM documents
),
bytes AS (
    SELECT media_id, n,
           ((strpos('0123456789ABCDEF',
                    substr(hx, CAST(2 * i + 1 AS BIGINT), 1)) - 1) * 16
            + strpos('0123456789ABCDEF',
                     substr(hx, CAST(2 * i + 2 AS BIGINT), 1)) - 1) AS v,
           (i * 16) // n AS k
    FROM (SELECT media_id, n, hx, UNNEST(generate_series(0, n - 1)) AS i
          FROM m WHERE n > 0)
),
cells AS (
    SELECT media_id, k, SUM(v) // COUNT(*) AS val
    FROM bytes GROUP BY media_id, k
),
grid AS (
    SELECT m.media_id, m.n, gs.k,
           COALESCE(c.val, 0) AS val
    FROM m
    CROSS JOIN (SELECT UNNEST(generate_series(0, 15)) AS k) gs
    LEFT JOIN cells c ON c.media_id = m.media_id AND c.k = gs.k
)
SELECT media_id, CAST(n AS BIGINT) AS n_bytes,
       string_agg(lpad(hex(CAST(val AS BIGINT)), 2, '0'), ''
                  ORDER BY k) AS resized_hex
FROM grid GROUP BY media_id, n
"""


@query("mm_resize_grid", _RESIZE_ORACLE)
def q_mm_resize_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media RESIZE (multimodal/media.resize_media): every document's
    synthetic payload block-mean-resampled to 16 cells in one Arrow
    mapInPandas pass — the thumbnail/patch normalization stage before
    features or phash, with the real-decoder swap point documented.
    Integer floor means rendered as fixed-width hex, so the DuckDB
    twin replays every cell bit-exactly from hex(payload). Executor-
    side, zero shuffle."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return resize_media(attach_fake_media(docs), out_cells=16)
