"""Hash-family builders for MinHash and SimHash — deterministic, seedable,
and pure Catalyst expressions (xxhash64 + long arithmetic).

MinHash signature: each shingle is xxhash64'd ONCE into two base hashes
(h1, h2); the k hash functions are derived arithmetically as
``h_i = h1 + i*h2`` (Kirsch-Mitzenmacher 2006 — two hashes suffice for
Bloom/MinHash-style families), and the signature is a single ``aggregate``
fold of per-shingle k-vectors into a running elementwise min. Work is
O(|shingles| * k) long-arithmetic ops per row with NO per-salt string
re-hashing and a codegen tree that is O(1) in k — the previous
formulation (k independent ``transform``/``array_min`` branches, each
re-hashing every shingle string) compiled to ~2 MB task binaries and ran
~20x slower. A 100 TB corpus minhashes at scan speed; the only shuffle in
LSH dedup is the band-bucket groupBy.

SimHash: 64-bit; bit b of the signature is the sign of the sum over
tokens of ±1 according to bit b of the token's xxhash64 — bits extracted
with shiftright/AND (long arithmetic), never via binary-string rendering.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# base hashes reduced mod a Mersenne prime so h1 + k*h2 stays < 2^38:
# overflow-free under ANSI mode and order-comparable as plain longs
_M61 = (1 << 31) - 1


def minhash_signature(shingles: Column, k: int = 64) -> Column:
    """Array of k minhash values over a (non-empty) shingle array.
    Empty arrays yield an array of NULLs (no shingles → no signature)."""
    base = F.transform(
        shingles,
        lambda s: F.struct(
            F.pmod(F.xxhash64(s), F.lit(_M61)).alias("a"),
            F.pmod(F.xxhash64(s, F.lit(1)), F.lit(_M61)).alias("b"),
        ),
    )
    idx = F.sequence(F.lit(1), F.lit(k))
    # least() ignores NULLs, so the all-NULL init folds to the true min;
    # an empty shingle array never folds and keeps the NULL signature.
    # The mod-p wrap is load-bearing: without it i*h2 dominates for large
    # i and the min-h2 shingle wins EVERY high component, correlating the
    # signature across documents that share any common shingle.
    return F.aggregate(
        base,
        F.array_repeat(F.lit(None).cast("long"), k),
        lambda acc, p: F.zip_with(
            acc,
            F.transform(idx, lambda i: F.pmod(p["a"] + i * p["b"], F.lit(_M61))),
            lambda m, h: F.least(m, h),
        ),
    )


def minhash_components(a: Column, b: Column, k: int) -> list[Column]:
    """The k Kirsch-Mitzenmacher hash values ``(a + i*b) mod p`` as
    separate columns — the explode/groupBy formulation of
    :func:`minhash_signature`. Higher-order array functions are
    interpreted per element in Spark, so folding signatures per row is
    ~20x slower than exploding shingles and taking ``min`` of these k
    expressions in a hash aggregate, which is whole-stage-codegen'd and
    map-side partial (shuffle = one 64-long row per document)."""
    return [F.pmod(a + F.lit(i) * b, F.lit(_M61)) for i in range(1, k + 1)]


def lsh_band_keys(signature: Column, bands: int, rows_per_band: int) -> Column:
    """Array of ``bands`` bucket keys; docs sharing any key are candidate
    near-duplicates (standard banding: P[candidate] ≈ 1-(1-j^r)^b).
    xxhash64 consumes the band's signature slice directly as longs — no
    string rendering."""
    return F.array(
        *[
            F.xxhash64(
                F.lit(b),
                *[
                    F.element_at(signature, b * rows_per_band + r + 1)
                    for r in range(rows_per_band)
                ],
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
    occurrence). Bit j comes from bit j of each token's xxhash64, summed
    as ±1 across tokens."""
    counts = F.aggregate(
        token_arr,
        F.array_repeat(F.lit(0).cast("long"), nbits),
        lambda acc, t: F.zip_with(acc, _bit_signs(F.xxhash64(t), nbits), lambda a, b: a + b),
    )
    return F.transform(counts, lambda cnt: (cnt > 0).cast("int"))


def _bit_signs(h: Column, nbits: int) -> Column:
    """Array[nbits] of +1/-1 from the low bits of a 64-bit hash —
    (h >> j) & 1, mapped to ±1. Arithmetic shift is fine: bit j of a
    negative long is still (h >> j) & 1 for j < 64."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(nbits - 1)),
        lambda j: F.call_function("shiftright", h, j).bitwiseAND(F.lit(1))
        * F.lit(2)
        - F.lit(1),
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
    distance < bands share at least one exact chunk (pigeonhole). Band key
    = xxhash64 over the chunk's bit ints (no string concat)."""
    width = nbits // bands
    return F.array(
        *[
            F.xxhash64(
                F.lit(b),
                *[F.element_at(bits, b * width + i + 1) for i in range(width)],
            )
            for b in range(bands)
        ]
    )
