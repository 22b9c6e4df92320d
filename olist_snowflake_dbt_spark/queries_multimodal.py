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
