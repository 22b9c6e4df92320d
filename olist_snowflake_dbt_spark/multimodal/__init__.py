"""Multimodal (image/audio/video) column support.

Media are opaque ``binary`` payload columns plus a typed metadata
struct; all per-byte work happens in Arrow-batched ``mapInPandas``
stages so a 100 TB media corpus streams through executors batch-by-batch
without ever materializing per-row Python objects or driver-side data.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so the
decode kernels are stubbed behind an import-try with a deterministic
fake (documented, test-covered); the Spark-side plumbing — schemas,
partitioning, UDF signatures, Arrow batch shapes, fan-out — is real.
"""

from .media import (
    MEDIA_META_SCHEMA,
    attach_fake_media,
    audio_fingerprint,
    audio_fp_pairs,
    decode_media,
    extract_features,
    frame_phashes,
    media_byte_stats,
    perceptual_hash,
    phash_incremental_admit,
    phash_pairs,
    resize_media,
    sample_frames,
    video_phash_pairs,
)

__all__ = [
    "MEDIA_META_SCHEMA",
    "attach_fake_media",
    "audio_fingerprint",
    "audio_fp_pairs",
    "decode_media",
    "extract_features",
    "frame_phashes",
    "media_byte_stats",
    "perceptual_hash",
    "phash_incremental_admit",
    "phash_pairs",
    "resize_media",
    "sample_frames",
    "video_phash_pairs",
]
