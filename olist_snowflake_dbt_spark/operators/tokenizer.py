"""Distributed BPE tokenizer training over a document corpus.

Byte-Pair Encoding (Sennrich, Haddow & Birch 2016, "Neural Machine
Translation of Rare Words with Subword Units", ACL — public knowledge)
is THE tokenizer-construction step of an LLM training-data pipeline:
iteratively merge the most frequent adjacent symbol pair until the
vocabulary budget is reached. The reference has no tokenizer surface
($REF is dbt SQL); this is part of the north-star training-data
extension set (SURVEY.md §2.C).

**Scale design.** BPE trains on the *word-frequency table*, never the
corpus: one corpus scan aggregates ``(word, freq)`` (Heaps' law — the
distinct-word table is orders of magnitude smaller than 100 TB of
text, and it is the classic Sennrich formulation), after which every
iteration is (a) one map-side-combined aggregate over the vocab for
pair counts, (b) a driver fetch of exactly ONE row (the argmax pair),
(c) a map-only literal ``replace`` to apply the merge, followed by a
``localCheckpoint`` so the plan stays constant-size across iterations
(the PageRank recipe). No UDF anywhere — both the pair explode and the
merge application are Catalyst expressions inside whole-stage codegen.

**The symbol-sequence encoding** makes true leftmost BPE merging a
LITERAL string replace (and therefore also replayable by any SQL
engine, which is how the driver oracle verifies the whole iterative
run):

    symbols [s1, s2, ..., sn]  ⇔  "||s1||s2||...||sn||"

i.e. every boundary is a DOUBLE pipe (words are ``[a-z0-9]+`` so ``|``
never occurs in a symbol). Merging pair (x, y) is then

    replace(enc, "|x||y|", "|xy|")

which is exact because (1) the pattern consumes one pipe from each
outer boundary, so a true symbol boundary always keeps one pipe on
each side and the double-pipe invariant is restored by the
replacement; (2) a false match inside a longer symbol is impossible —
the pattern requires a pipe immediately after ``x`` and around ``y``;
(3) ``replace`` scans leftmost non-overlapping, which IS the BPE merge
order: for a run ``||a||a||a||a||a||`` with pair (a, a) the matches
are positions 1 and 4 → ``||aa||aa||a||`` — exactly Sennrich's
leftmost pairing (property-tested against a from-the-paper Python
implementation in tests/test_tokenizer.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from ..functions.local_frame import arrow_local_df
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.text import words

MERGES_SCHEMA = StructType(
    [
        StructField("merge_rank", IntegerType()),
        StructField("lhs", StringType()),
        StructField("rhs", StringType()),
        StructField("merged", StringType()),
        StructField("freq", LongType()),
    ]
)


def encode_symbols(word: Column) -> Column:
    """``'abc'`` → ``'||a||b||c||'`` — the double-pipe symbol encoding
    (module docstring). One regexp_replace, fully codegen'd."""
    return F.concat(F.lit("||"), F.regexp_replace(word, "(.)", "$1||"))


def symbols_of(enc: Column) -> Column:
    """Decode an encoding back to its symbol array."""
    return F.filter(F.split(enc, r"\|\|"), lambda s: s != "")


def merge_expr(enc: Column, lhs: str, rhs: str) -> Column:
    """Apply ONE BPE merge to an encoded symbol sequence — a literal
    leftmost non-overlapping replace (exactness argument in the module
    docstring)."""
    return F.replace(
        enc, F.lit(f"|{lhs}||{rhs}|"), F.lit(f"|{lhs}{rhs}|")
    )


def word_freq_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """ONE corpus scan → ``(word, freq, enc)``: the Sennrich training
    table. freq counts occurrences (not documents); enc is the initial
    single-character symbol encoding."""
    return (
        df.select(F.explode(words(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("enc", encode_symbols(F.col("word")))
    )


def pair_freqs(vocab: DataFrame) -> DataFrame:
    """Adjacent-symbol pair frequencies over a ``(freq, enc)`` vocab
    table, occurrence-weighted (a word with symbols ``[a,a,a]``
    contributes the pair (a,a) twice per occurrence, as in the
    reference algorithm). One explode + one map-side-combined hash
    aggregate; output ``(lhs, rhs, freq)``."""
    syms = symbols_of(F.col("enc"))
    n = F.size(syms)
    pairs = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda k: F.struct(
                F.element_at(syms, k).alias("lhs"),
                F.element_at(syms, k + 1).alias("rhs"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<lhs:string,rhs:string>>"))
    return (
        vocab.select(F.col("freq"), F.explode(pairs).alias("pr"))
        .groupBy(F.col("pr.lhs").alias("lhs"), F.col("pr.rhs").alias("rhs"))
        .agg(F.sum("freq").alias("freq"))
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 8,
    min_freq: int = 2,
) -> DataFrame:
    """Learn ``num_merges`` BPE merges from the corpus; returns the
    merge table ``(merge_rank, lhs, rhs, merged, freq)`` in learning
    order. Ties break deterministically by (freq DESC, lhs ASC, rhs
    ASC) — identical on any engine. Stops early when the best remaining
    pair falls under ``min_freq`` (or no pairs remain).

    Driver involvement per iteration: ONE argmax row (TakeOrdered —
    a global top-1, not a sort) plus issuing the next map-only merge;
    the vocab table itself never leaves the executors and is
    re-materialized per round via ``localCheckpoint`` to keep the plan
    constant-size."""
    if num_merges <= 0:
        raise ValueError(f"num_merges must be positive, got {num_merges}")
    spark = df.sparkSession
    vocab = word_freq_table(df, text_col).select("freq", "enc").localCheckpoint()
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, num_merges + 1):
        best = (
            pair_freqs(vocab)
            .orderBy(F.desc("freq"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["freq"] < min_freq:
            break
        lhs, rhs, freq = best[0]["lhs"], best[0]["rhs"], int(best[0]["freq"])
        merges.append((rank, lhs, rhs, lhs + rhs, freq))
        vocab = vocab.withColumn(
            "enc", merge_expr(F.col("enc"), lhs, rhs)
        ).localCheckpoint()
    return arrow_local_df(spark, merges, MERGES_SCHEMA)


def bpe_train_batched(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 8,
    min_freq: int = 2,
    batch: int = 4,
    candidate_window: int | None = None,
) -> DataFrame:
    """Batched BPE trainer — the scale fix for :func:`bpe_train`'s
    one-driver-round-trip-per-merge coordination cost (32k sequential
    Spark jobs at a real vocab size). Per ROUND it takes the top
    ``candidate_window`` pairs in ONE TakeOrdered, greedily accepts up
    to ``batch`` of them that are pairwise SYMBOL-DISJOINT — no
    accepted pair shares lhs, rhs, OR its merged OUTPUT symbol with
    another accepted merge's {lhs, rhs, merged}. Input-disjointness
    means no accepted merge changes another's pre-round counts or
    consumes its pattern; output-disjointness (the round-11 advisory)
    additionally guarantees no accepted pattern can match text another
    accepted replacement CREATED in the same round, so the fused
    chained replace applies each merge exactly at its recorded
    pre-round frequency. It then applies all accepted merges
    as ONE fused literal-replace projection + ONE ``localCheckpoint``.
    Driver rounds ≈ ``num_merges / batch`` instead of ``num_merges``;
    per-round data movement is unchanged (one vocab-sized aggregate +
    a ``candidate_window``-row TakeOrdered).

    SEMANTICS vs sequential BPE (documented divergence): within a
    round all selections score against the PRE-round pair counts, so
    batched training diverges from Sennrich's sequential algorithm
    exactly when a merge would have created or changed a pair that
    outranks a later in-round selection (e.g. merging (a,b) creates
    (ab,ab) pairs a sequential trainer might pick next). With
    ``batch=1`` every round is a single argmax and the output is
    IDENTICAL to :func:`bpe_train` (tested). The algorithm — greedy
    disjoint selection over the top-``candidate_window`` candidates
    under the (freq DESC, lhs, rhs) total order — is itself exactly
    replayable in SQL, which is how the driver oracle verifies the
    full batched run end-to-end.

    Output schema matches :func:`bpe_train`; ``merge_rank`` numbers
    accepted merges contiguously in (round, slot) order and the table
    is trimmed to ``num_merges`` rows. ``freq`` is the selection-time
    (pre-round) pair count. Training stops early when a round accepts
    nothing (no candidate ≥ ``min_freq`` survives — a later round sees
    the same vocab, so it could never accept either). The round count
    is FIXED at ``ceil(num_merges / batch)`` — that bound IS the
    coordination-cost contract — so when disjointness conflicts leave
    round slots unfilled the table can come back with fewer than
    ``num_merges`` rows (callers wanting an exact vocab size budget
    extra rounds via a larger ``num_merges``).
    """
    if num_merges <= 0:
        raise ValueError(f"num_merges must be positive, got {num_merges}")
    if batch <= 0:
        raise ValueError(f"batch must be positive, got {batch}")
    window = candidate_window or max(4 * batch, 16)
    if window < batch:
        raise ValueError(
            f"candidate_window must be >= batch ({window} < {batch})"
        )
    spark = df.sparkSession
    rounds = -(-num_merges // batch)
    vocab = word_freq_table(df, text_col).select("freq", "enc").localCheckpoint()
    merges: list[tuple[int, str, str, str, int]] = []
    for _ in range(rounds):
        cand = (
            pair_freqs(vocab)
            .filter(F.col("freq") >= min_freq)
            .orderBy(F.desc("freq"), F.asc("lhs"), F.asc("rhs"))
            .limit(window)
            .collect()
        )
        accepted: list[tuple[str, str, int]] = []
        used: set[str] = set()
        for row in cand:
            if len(accepted) == batch:
                break
            syms = (row["lhs"], row["rhs"], row["lhs"] + row["rhs"])
            if any(s in used for s in syms):
                continue
            accepted.append((row["lhs"], row["rhs"], int(row["freq"])))
            used.update(syms)
        if not accepted:
            break
        enc = F.col("enc")
        for lhs, rhs, _f in accepted:
            enc = merge_expr(enc, lhs, rhs)
        vocab = vocab.withColumn("enc", enc).localCheckpoint()
        merges.extend(
            (len(merges) + i + 1, lhs, rhs, lhs + rhs, freq)
            for i, (lhs, rhs, freq) in enumerate(accepted)
        )
    merges = merges[:num_merges]
    merges = [
        (i + 1, lhs, rhs, m, f)
        for i, (_, lhs, rhs, m, f) in enumerate(merges)
    ]
    return arrow_local_df(spark, merges, MERGES_SCHEMA)


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]] | DataFrame,
    text_col: str = "text",
    out_col: str = "tokens",
) -> DataFrame:
    """Tokenize text with a learned merge table: per normalized word,
    apply every merge in rank order (the standard BPE encoder), then
    flatten the per-word token arrays. The merge chain compiles to
    ``num_merges`` nested literal replaces inside ONE codegen'd
    projection — map-only, no shuffle, no UDF. Appends ``out_col``
    (array<string>) and ``n_{out_col}``."""
    if isinstance(merges, DataFrame):
        rows = merges.orderBy("merge_rank").collect()
        merge_list = [(r["lhs"], r["rhs"]) for r in rows]
    else:
        merge_list = list(merges)

    def encode_word(w: Column) -> Column:
        enc = encode_symbols(w)
        for lhs, rhs in merge_list:
            enc = merge_expr(enc, lhs, rhs)
        return symbols_of(enc)

    toks = F.flatten(F.transform(words(text_col), encode_word))
    return df.withColumn(out_col, toks).withColumn(
        f"n_{out_col}", F.size(F.col(out_col)).cast("long")
    )


def oov_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 256,
) -> DataFrame:
    """Tokenizer-coverage evaluation: per document, how much of it
    falls OUTSIDE a closed vocabulary — the go/no-go readout before
    committing a tokenizer/vocab budget to a corpus (a high OOV rate
    means the vocab was sized or sourced wrong for this data; the
    fertility/coverage sweeps tokenizer papers run before training).

    The vocabulary is the corpus's own top-``vocab_size`` words by
    frequency (ties broken by word, so the vocab — and therefore every
    downstream number — is deterministic), the word-level stand-in for
    a trained subword vocab (the BPE surface in this module trains
    real merges; coverage measurement is vocab-agnostic). Emits per
    document: ``n_words``, ``n_oov`` (token occurrences not in vocab),
    ``n_distinct_oov``, and ``oov_per_mille`` (integer ``1000·n_oov
    div n_words`` — the module's no-float contract). Zero-word
    documents report all zeros.

    Plan shape: one map-side-combined word census (Heaps' law keeps
    the distinct-word table tiny relative to the corpus), a top-k
    (TakeOrdered, never a global sort) for the vocab, then ONE
    broadcast left join from the exploded corpus and one per-doc
    aggregate — 2 corpus-sized shuffles total, vocab rides broadcast.
    """
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    toks = df.select(F.col(id_col), F.explode(words(text_col)).alias("__w"))
    freq = toks.groupBy("__w").agg(F.count(F.lit(1)).alias("__c"))
    vocab = (
        freq.orderBy(F.col("__c").desc(), F.col("__w").asc())
        .limit(vocab_size)
        .select("__w", F.lit(1).alias("__in"))
    )
    per = (
        toks.join(F.broadcast(vocab), "__w", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.when(F.col("__in").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
            F.count_distinct(
                F.when(F.col("__in").isNull(), F.col("__w"))
            ).alias("n_distinct_oov"),
        )
    )
    zero = F.lit(0).cast("long")
    return (
        df.select(id_col)
        .join(per, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_words", zero).alias("n_words"),
            F.coalesce("n_oov", zero).alias("n_oov"),
            F.coalesce("n_distinct_oov", zero).alias("n_distinct_oov"),
            F.coalesce(
                F.expr("(1000 * n_oov) div n_words"), zero
            ).alias("oov_per_mille"),
        )
    )
