"""Hash-family builders for MinHash and SimHash — deterministic, seedable,
and pure Catalyst expressions (xxhash64 under k salts).

MinHash signature: ``sig[i] = min over shingles s of xxhash64(s, salt_i)``
— k independent-enough hash functions via salting, no modular arithmetic
(64-bit wraparound is already uniform). Computed per row with
``transform``/``array_min`` over the shingle array: no explode, no
shuffle, no UDF. A 100 TB corpus minhashes at scan speed; the only
shuffle in LSH dedup is the band-bucket groupBy.

SimHash: 64-bit; bit b of the signature is the sign of the sum over
tokens of ±1 according to bit b of the token's hash.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def minhash_signature(shingles: Column, k: int = 64) -> Column:
    """Array of k minhash values over a (non-empty) shingle array.
    Empty arrays yield an array of NULLs (no shingles → no signature)."""
    return F.array(
        *[
            F.array_min(
                F.transform(shingles, lambda s, i=i: F.xxhash64(s, F.lit(i)))
            )
            for i in range(k)
        ]
    )


def lsh_band_keys(signature: Column, bands: int, rows_per_band: int) -> Column:
    """Array of ``bands`` bucket keys; docs sharing any key are candidate
    near-duplicates (standard banding: P[candidate] ≈ 1-(1-j^r)^b)."""
    return F.array(
        *[
            F.xxhash64(
                F.lit(b),
                F.concat_ws(",", *[
                    F.element_at(signature, b * rows_per_band + r + 1).cast("string")
                    for r in range(rows_per_band)
                ]),
            )
            for b in range(bands)
        ]
    )


def signature_jaccard(sig_a: Column, sig_b: Column) -> Column:
    """MinHash estimate of Jaccard = fraction of agreeing components."""
    agree = F.aggregate(
        F.zip_with(sig_a, sig_b, lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return agree / F.size(sig_a)


def simhash_bits(token_arr: Column, nbits: int = 64) -> Column:
    """SimHash as an array of ``nbits`` 0/1 ints (weight 1 per token
    occurrence). Bit j comes from bit j of each token's xxhash64 (via its
    binary-string rendering — MSB first), summed as ±1 across tokens."""
    counts = F.aggregate(
        token_arr,
        F.array_repeat(F.lit(0).cast("long"), nbits),
        lambda acc, t: F.zip_with(acc, _bit_signs(F.xxhash64(t), nbits), lambda a, b: a + b),
    )
    return F.transform(counts, lambda cnt: (cnt > 0).cast("int"))


def _bit_signs(h: Column, nbits: int) -> Column:
    """Array[nbits] of +1/-1 from the top bits of a 64-bit hash."""
    bstr = F.lpad(F.bin(h), 64, "0")  # two's-complement binary, MSB first
    return F.transform(
        F.sequence(F.lit(1), F.lit(nbits)),
        lambda i: F.when(bstr.substr(i, F.lit(1)) == "1", F.lit(1).cast("long")).otherwise(
            F.lit(-1).cast("long")
        ),
    )


def hamming_bits(a: Column, b: Column) -> Column:
    """Hamming distance between two bit-array signatures."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x != y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def simhash_band_keys(bits: Column, bands: int = 4, nbits: int = 64) -> Column:
    """Split the bit array into ``bands`` chunks; near-dups within Hamming
    distance < bands share at least one exact chunk (pigeonhole)."""
    width = nbits // bands
    return F.array(
        *[
            F.xxhash64(
                F.lit(b),
                F.concat_ws("", *[
                    F.element_at(bits, b * width + i + 1).cast("string")
                    for i in range(width)
                ]),
            )
            for b in range(bands)
        ]
    )
