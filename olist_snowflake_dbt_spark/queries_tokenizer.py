"""Driver queries for the BPE tokenizer surface (operators/tokenizer).

The headline trick: even the ITERATIVE trainer is oracle-checkable,
because the double-pipe symbol encoding turns each BPE merge into a
literal ``replace`` both engines execute identically — so the oracle
below UNROLLS the full train loop as a WITH chain (built
programmatically, one ``(pair-count → argmax → replace)`` stage per
merge rank). Early stopping matches by construction: an empty argmax
CTE empties every later stage, truncating both sides at the same rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _t, query

_NUM_MERGES = 8
_MIN_FREQ = 2

# (word, freq) over the normalized [a-z0-9]+ word stream — shared stage
# of both oracles; identical to functions.text.words + explode/count.
_WORDS_SQL = """
    SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
    FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
          FROM documents)
    GROUP BY word
"""

_PAIR_FREQS_ORACLE = f"""
WITH w AS ({_WORDS_SQL}),
p AS (
    SELECT unnest(list_transform(range(1, length(word)), k -> word[k])) AS lhs,
           unnest(list_transform(range(1, length(word)), k -> word[k+1])) AS rhs,
           freq
    FROM w WHERE length(word) >= 2
)
SELECT lhs, rhs, CAST(SUM(freq) AS BIGINT) AS freq
FROM p GROUP BY 1, 2
ORDER BY freq DESC, lhs, rhs
LIMIT 20
"""


def _bpe_train_oracle(num_merges: int, min_freq: int) -> str:
    """Unroll the Sennrich train loop as SQL: w0 is the encoded vocab;
    stage i computes pair counts over w{i-1}, picks the argmax under
    the (freq DESC, lhs, rhs) total order, and applies the literal
    replace. Union of the argmax CTEs = the merge table."""
    ctes = [
        f"""w0 AS (
    SELECT freq, '||' || regexp_replace(word, '(.)', '\\1||', 'g') AS enc
    FROM ({_WORDS_SQL})
)"""
    ]
    for i in range(1, num_merges + 1):
        ctes.append(f"""p{i} AS (
    SELECT lhs, rhs, CAST(SUM(freq) AS BIGINT) AS freq FROM (
        SELECT freq,
               unnest(list_transform(range(1, length(syms)), k -> syms[k])) AS lhs,
               unnest(list_transform(range(1, length(syms)), k -> syms[k+1])) AS rhs
        FROM (SELECT freq,
                     list_filter(string_split(enc, '||'), s -> s <> '') AS syms
              FROM w{i - 1})
        WHERE length(syms) >= 2
    ) GROUP BY 1, 2
)""")
        ctes.append(f"""b{i} AS (
    SELECT CAST({i} AS INTEGER) AS merge_rank, lhs, rhs,
           lhs || rhs AS merged, freq
    FROM p{i} WHERE freq >= {min_freq}
    ORDER BY freq DESC, lhs, rhs LIMIT 1
)""")
        ctes.append(f"""w{i} AS (
    SELECT w.freq,
           replace(w.enc, '|' || b.lhs || '||' || b.rhs || '|',
                          '|' || b.lhs || b.rhs || '|') AS enc
    FROM w{i - 1} w, b{i} b
)""")
    union = "\nUNION ALL\n".join(
        f"SELECT * FROM b{i}" for i in range(1, num_merges + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + union


@query("tokenizer_pair_freqs", _PAIR_FREQS_ORACLE)
def q_tokenizer_pair_freqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE stage 1 — occurrence-weighted adjacent character-pair
    frequencies over the word-frequency table, top 20 under the
    deterministic (freq DESC, lhs, rhs) total order. ONE corpus scan +
    two map-side-combined aggregates; the pair explode runs over the
    distinct-word table, not the corpus (Heaps' law — the whole point
    of training BPE on word freqs)."""
    from .operators.tokenizer import pair_freqs, word_freq_table

    docs = _t(spark, sf_dir, "documents")
    return (
        pair_freqs(word_freq_table(docs, "text"))
        .orderBy(F.desc("freq"), F.asc("lhs"), F.asc("rhs"))
        .limit(20)
    )


@query(
    "tokenizer_bpe_train",
    _bpe_train_oracle(_NUM_MERGES, _MIN_FREQ),
)
def q_tokenizer_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full iterative BPE trainer (8 merges, min pair freq 2) over
    the documents corpus — merge table out, golden-tested against the
    Sennrich reference implementation (tests/test_tokenizer.py) and
    replayed end-to-end by the unrolled SQL oracle (module docstring).
    Per-iteration data movement: one vocab-sized aggregate + a 1-row
    argmax to the driver; merge application is a literal-replace
    projection (no UDF, no corpus rescan)."""
    from .operators.tokenizer import bpe_train

    docs = _t(spark, sf_dir, "documents")
    return bpe_train(docs, "text", _NUM_MERGES, _MIN_FREQ)


def _pair_counts_sql(src: str) -> str:
    """Pair-count subquery over an encoded vocab CTE ``src``."""
    return f"""SELECT lhs, rhs, CAST(SUM(freq) AS BIGINT) AS freq FROM (
        SELECT freq,
               unnest(list_transform(range(1, length(syms)), k -> syms[k])) AS lhs,
               unnest(list_transform(range(1, length(syms)), k -> syms[k+1])) AS rhs
        FROM (SELECT freq,
                     list_filter(string_split(enc, '||'), s -> s <> '') AS syms
              FROM {src})
        WHERE length(syms) >= 2
    ) GROUP BY 1, 2"""


def _bpe_train_batched_oracle(
    num_merges: int, min_freq: int, batch: int, window: int
) -> str:
    """Unroll the BATCHED train loop (operators/tokenizer.
    bpe_train_batched) as SQL: per round, the top-``window`` candidate
    pairs under the (freq DESC, lhs, rhs) total order; per slot, the
    best candidate symbol-disjoint from the round's earlier slots —
    disjoint over {lhs, rhs, merged} on BOTH sides, mirroring the
    operator's output-symbol rule (greedy = successive constrained
    argmax); all of a round's accepted
    merges applied as one nested-replace projection with chr(1) no-op
    guards for empty slots. Ranks = row_number over (round, slot),
    trimmed to ``num_merges`` — token-for-token the batched trainer's
    contract."""
    rounds = -(-num_merges // batch)
    ctes = [
        f"""w0 AS (
    SELECT freq, '||' || regexp_replace(word, '(.)', '\\1||', 'g') AS enc
    FROM ({_WORDS_SQL})
)"""
    ]
    for r in range(1, rounds + 1):
        ctes.append(f"""c{r} AS (
    SELECT lhs, rhs, freq FROM ({_pair_counts_sql(f"w{r - 1}")})
    WHERE freq >= {min_freq}
    ORDER BY freq DESC, lhs, rhs LIMIT {window}
)""")
        for j in range(1, batch + 1):
            if j == 1:
                conflict = ""
            else:
                prior = "\n        UNION ALL ".join(
                    f"SELECT lhs, rhs FROM s{r}_{i}" for i in range(1, j)
                )
                conflict = f"""
    WHERE NOT EXISTS (
        SELECT 1 FROM ({prior}) a
        WHERE a.lhs IN (c.lhs, c.rhs, c.lhs || c.rhs)
           OR a.rhs IN (c.lhs, c.rhs, c.lhs || c.rhs)
           OR (a.lhs || a.rhs) IN (c.lhs, c.rhs, c.lhs || c.rhs))"""
            ctes.append(f"""s{r}_{j} AS (
    SELECT lhs, rhs, freq FROM c{r} c{conflict}
    ORDER BY freq DESC, lhs, rhs LIMIT 1
)""")
            ctes.append(f"""g{r}_{j} AS (
    SELECT lhs, rhs FROM s{r}_{j}
    UNION ALL
    SELECT chr(1), chr(1) WHERE NOT EXISTS (SELECT 1 FROM s{r}_{j})
)""")
        rep = "w.enc"
        for j in range(1, batch + 1):
            rep = (
                f"replace({rep}, '|' || g{j}.lhs || '||' || g{j}.rhs || '|',"
                f" '|' || g{j}.lhs || g{j}.rhs || '|')"
            )
        srcs = ", ".join(f"g{r}_{j} g{j}" for j in range(1, batch + 1))
        ctes.append(f"""w{r} AS (
    SELECT w.freq, {rep} AS enc
    FROM w{r - 1} w, {srcs}
)""")
    union = "\nUNION ALL\n".join(
        f"SELECT {r} AS rnd, {j} AS slot, lhs, rhs, freq FROM s{r}_{j}"
        for r in range(1, rounds + 1)
        for j in range(1, batch + 1)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
allm AS (
{union}
)
SELECT merge_rank, lhs, rhs, merged, freq FROM (
    SELECT CAST(row_number() OVER (ORDER BY rnd, slot) AS INTEGER)
               AS merge_rank,
           lhs, rhs, lhs || rhs AS merged, CAST(freq AS BIGINT) AS freq
    FROM allm
) WHERE merge_rank <= {num_merges}"""
    )


_BATCH = 4
_BATCH_WINDOW = 16


@query(
    "tokenizer_bpe_train_batched",
    _bpe_train_batched_oracle(_NUM_MERGES, _MIN_FREQ, _BATCH, _BATCH_WINDOW),
)
def q_tokenizer_bpe_train_batched(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """BATCHED BPE trainer (operators/tokenizer.bpe_train_batched — the
    round-11 fix for the sequential trainer's driver-coordination
    bottleneck): 8 merges learned in 2 rounds of up to 4 pairwise
    symbol-disjoint merges each, every round ONE vocab aggregate + ONE
    16-row TakeOrdered + ONE fused literal-replace projection. Driver
    rounds scale as merges/batch (a 32k-merge production vocab at
    batch=256 is ~128 rounds, not 32k). The oracle replays the batched
    algorithm exactly — candidate window, greedy disjoint selection,
    fused application, rank assignment — as one unrolled statement."""
    from .operators.tokenizer import bpe_train_batched

    docs = _t(spark, sf_dir, "documents")
    return bpe_train_batched(
        docs,
        "text",
        _NUM_MERGES,
        _MIN_FREQ,
        batch=_BATCH,
        candidate_window=_BATCH_WINDOW,
    )


def _bpe_segment_oracle(num_merges: int, min_freq: int) -> str:
    """Train (the unrolled chain from ``_bpe_train_oracle``) then ENCODE
    the corpus with the learned merges: per document, word count, total
    normalized chars, and the post-merge token count. Each merge stage
    gets a no-op guard row (a chr(1) pattern that can never match the
    ``[a-z0-9]`` symbol alphabet) so early-stopped ranks degrade to
    identity instead of annihilating the cross join."""
    train = _bpe_train_oracle(num_merges, min_freq)
    # keep only the CTE chain; rebuild the tail for encoding
    with_block = train[len("WITH "):train.index("\nSELECT * FROM b1")]
    ctes = [with_block]
    ctes.append("""e0 AS (
    SELECT doc_id,
           '||' || regexp_replace(word, '(.)', '\\1||', 'g') AS enc
    FROM (SELECT doc_id,
                 unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
          FROM documents)
)""")
    for i in range(1, num_merges + 1):
        ctes.append(f"""g{i} AS (
    SELECT lhs, rhs FROM b{i}
    UNION ALL
    SELECT chr(1), chr(1) WHERE NOT EXISTS (SELECT 1 FROM b{i})
)""")
        ctes.append(f"""e{i} AS (
    SELECT doc_id,
           replace(enc, '|' || g.lhs || '||' || g.rhs || '|',
                        '|' || g.lhs || g.rhs || '|') AS enc
    FROM e{i - 1}, g{i} g
)""")
    tail = f"""
SELECT d.doc_id,
       CAST(COALESCE(a.n_words, 0) AS BIGINT) AS n_words,
       CAST(COALESCE(a.n_chars_norm, 0) AS BIGINT) AS n_chars_norm,
       CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens
FROM documents d
LEFT JOIN (
    SELECT doc_id, COUNT(*) AS n_words,
           SUM(length(replace(enc, '|', ''))) AS n_chars_norm,
           SUM(length(list_filter(string_split(enc, '||'),
                                  s -> s <> ''))) AS n_tokens
    FROM e{num_merges} GROUP BY doc_id
) a ON d.doc_id = a.doc_id
"""
    return "WITH " + ",\n".join(ctes) + tail


@query(
    "tokenizer_bpe_segment",
    _bpe_segment_oracle(_NUM_MERGES, _MIN_FREQ),
)
def q_tokenizer_bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-tokenize accounting: learn the 8-merge BPE table, then
    encode every document with it — per doc the word count, normalized
    char count, and post-merge token count (the numbers a token-budget
    planner actually needs). The encode leg is ONE codegen'd map-only
    projection (the merge chain compiles to 8 nested literal replaces);
    docs with zero normalized words keep a row with zeros. The oracle
    replays training AND encoding in one unrolled statement."""
    from .operators.tokenizer import bpe_segment, bpe_train

    docs = _t(spark, sf_dir, "documents")
    merges = bpe_train(docs, "text", _NUM_MERGES, _MIN_FREQ)
    seg = bpe_segment(docs, merges, "text")
    return seg.select(
        "doc_id",
        F.size(F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
        .cast("long")
        .alias("n_words"),
        F.aggregate(
            F.col("tokens"),
            F.lit(0).cast("long"),
            lambda acc, t: acc + F.length(t).cast("long"),
        ).alias("n_chars_norm"),
        F.col("n_tokens"),
    )


_OOV_ORACLE = """
    WITH toks AS (
        SELECT doc_id,
               unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
        FROM documents
    ),
    freq AS (SELECT word, COUNT(*) AS c FROM toks GROUP BY 1),
    vocab AS (SELECT word FROM freq ORDER BY c DESC, word LIMIT 256),
    per AS (
        SELECT t.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_words,
               CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_oov,
               CAST(COUNT(DISTINCT CASE WHEN v.word IS NULL
                                        THEN t.word END)
                    AS BIGINT) AS n_distinct_oov
        FROM toks t LEFT JOIN vocab v USING (word)
        GROUP BY 1
    )
    SELECT d.doc_id,
           COALESCE(per.n_words, 0) AS n_words,
           COALESCE(per.n_oov, 0) AS n_oov,
           COALESCE(per.n_distinct_oov, 0) AS n_distinct_oov,
           COALESCE((1000 * per.n_oov) // per.n_words, 0) AS oov_per_mille
    FROM (SELECT doc_id FROM documents) d
    LEFT JOIN per ON d.doc_id = per.doc_id
"""


@query("tokenizer_oov_stats", _OOV_ORACLE)
def q_tokenizer_oov_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-coverage evaluation (operators/tokenizer.oov_stats,
    round 14): per document, occurrences / distinct words falling
    outside the corpus's own deterministic top-256 word vocabulary
    (ties by word) — the coverage/OOV sweep run before committing a
    vocab budget. One word census + TakeOrdered top-k + one broadcast
    left join + one per-doc aggregate; integer per-mille, no floats."""
    from .operators.tokenizer import oov_stats

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return oov_stats(docs, "text", "doc_id", vocab_size=256)
