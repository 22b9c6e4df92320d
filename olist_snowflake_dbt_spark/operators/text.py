"""Text-analysis operators over a documents table: language ID, quality
scoring, token statistics, fingerprinting.

All Catalyst expressions over functions/text.py primitives — a 100 TB
corpus is scored in a single scan with zero Python; every output column
is deterministic (oracle-checkable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import fingerprint, token_count, tokens, words
from ._cache import scoped_persist

# Tiny per-language stopword sets — the heuristic's knowledge base. An
# n-gram language model would be loaded the same way (broadcast lookup).
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "for", "on"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "una", "los", "por"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "zu"),
    "fr": ("le", "la", "les", "de", "et", "un", "une", "est", "pour", "dans"),
    "zh": ("的", "是", "了", "在", "和", "有", "我", "不", "人", "这"),
}


def _occurrences(c: Column, pat: str) -> Column:
    """Count non-overlapping occurrences of a literal substring —
    (len - len(replace)) / len(pat). Portable to any SQL engine."""
    return ((F.length(c) - F.length(F.replace(c, F.lit(pat)))) / F.lit(len(pat))).cast("long")


def _padded(text_col: str) -> Column:
    """Lowercased text with whitespace collapsed and space-padded ends, so
    ``' the '`` matches word-delimited tokens."""
    return F.concat(
        F.lit(" "), F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "), F.lit(" ")
    )


def stopword_hits(text_col: str, lang: str, padded: Column | None = None) -> Column:
    """Total stopword occurrences of ``lang`` in the text. Latin-script
    stopwords match as space-delimited words; CJK stopwords match as
    characters (no word boundaries in the script).

    ``padded``: pass a pre-bound :func:`_padded` ATTRIBUTE when summing
    hits for many languages — otherwise the padding expression (a
    lowercase + regex pass over the whole text) is inlined into every
    one of the ~2·|stopwords| references and re-evaluated each time."""
    c = padded if padded is not None else _padded(text_col)
    total = F.lit(0).cast("long")
    for w in STOPWORDS[lang]:
        pat = w if lang == "zh" else f" {w} "
        total = total + _occurrences(c, pat)
    return total


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Predict language by stopword vote: argmax over languages of the
    stopword-occurrence count (ties → lexicographically first language,
    fully deterministic). Adds ``predicted_lang``. The padded text is
    bound once as a projected column, so the plan pays ONE
    lowercase+regex normalization per row and then ~100 codegen'd
    substring scans of the bound attribute (CollapseProject keeps
    non-cheap multi-referenced aliases at their own projection — without
    the binding, the normalization itself ran ~100x per row and
    dominated the query). No model download, no UDF."""
    base = df.withColumn("__padded", _padded(text_col))
    ranked = [
        F.struct(
            stopword_hits(text_col, lang, padded=F.col("__padded")).alias("hits"),
            F.lit(-i).alias("tie"),
            F.lit(lang).alias("lang"),
        )
        for i, lang in enumerate(sorted(STOPWORDS))
    ]
    return base.withColumn(
        "predicted_lang", F.array_max(F.array(*ranked))["lang"]
    ).drop("__padded")


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + composite score:

    - ``n_tokens``, ``avg_token_len``
    - ``punct_ratio``   (punctuation chars / chars)
    - ``digit_ratio``   (digit chars / chars)
    - ``upper_ratio``   (uppercase chars / chars)
    - ``stopword_ratio``(English stopword tokens / tokens)
    - ``quality``       in [0,1]: length-band * (1-punct) * stopword band
    """
    c = F.col(text_col)
    n_chars = F.length(c)
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[\.,!\?;:]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(c, r"[0-9]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(c, r"[A-Z]", ""))
    toks = tokens(text_col)
    n_tokens = F.size(toks)
    sw_hits = stopword_hits(text_col, "en")
    out = (
        df.withColumn("n_tokens", n_tokens)
        .withColumn(
            "avg_token_len",
            F.when(n_tokens > 0,
                   (F.length(F.regexp_replace(c, r"\s+", "")) / n_tokens)),
        )
        .withColumn("punct_ratio", F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0))
        .withColumn("digit_ratio", F.when(n_chars > 0, n_digit / n_chars).otherwise(0.0))
        .withColumn("upper_ratio", F.when(n_chars > 0, n_upper / n_chars).otherwise(0.0))
        .withColumn("stopword_ratio", F.when(n_tokens > 0, sw_hits / n_tokens).otherwise(0.0))
    )
    len_band = (
        F.when((F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 1000), F.lit(1.0))
        .when(F.col("n_tokens") > 0, F.lit(0.5))
        .otherwise(F.lit(0.0))
    )
    return out.withColumn(
        "quality",
        len_band * (1 - F.least(F.col("punct_ratio") * 5, F.lit(1.0)))
        * (0.5 + 0.5 * F.least(F.col("stopword_ratio") * 4, F.lit(1.0))),
    )


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace + BPE-ish token accounting: ``n_tokens`` (whitespace),
    ``n_subword_tokens`` (BPE-approximating regex: runs of letters,
    digits, or single punctuation — the GPT-2 pre-tokenizer shape),
    ``n_chars``."""
    bpe_re = F.lit(r"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]")
    return (
        df.withColumn("n_tokens", token_count(text_col))
        .withColumn(
            "n_subword_tokens", F.size(F.regexp_extract_all(F.col(text_col), bpe_re, 0))
        )
        .withColumn("n_chars_measured", F.length(text_col))
    )


def add_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("doc_fingerprint", fingerprint(text_col))


def repetition_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style within-document repetition signals — the standard
    pre-training quality filters that catch boilerplate and degenerate
    generations:

    - ``n_words``
    - ``dup_word_frac``  — 1 - distinct words / words
    - ``dup_2gram_frac`` — 1 - distinct 2-grams / 2-grams

    Pure per-row array expressions over one bound word array: zero
    shuffle, zero UDF — at 100 TB this is a map-only pass fused into
    the scan. Empty documents score 0.0 (nothing repeats)."""
    base = df.withColumn("__w", words(text_col))
    nw = F.size(F.col("__w"))
    n2 = F.greatest(nw - 1, F.lit(0))
    # 2-grams as strings over the bound array; distinct via array_distinct
    grams = F.when(nw >= 2, F.transform(
        F.slice(F.col("__w"), 1, n2),
        lambda w, i: F.concat_ws(" ", w, F.element_at(F.col("__w"), i + 2)),
    )).otherwise(F.array().cast("array<string>"))
    out = (
        base.withColumn("n_words", nw.cast("long"))
        .withColumn(
            "dup_word_frac",
            F.when(nw > 0, 1.0 - F.size(F.array_distinct(F.col("__w"))) / nw)
            .otherwise(0.0),
        )
        .withColumn("__g", grams)
        .withColumn(
            "dup_2gram_frac",
            F.when(
                F.size(F.col("__g")) > 0,
                1.0 - F.size(F.array_distinct(F.col("__g"))) / F.size(F.col("__g")),
            ).otherwise(0.0),
        )
    )
    return out.drop("__w", "__g")


#: stopwords whose PRESENCE (not ratio) Gopher requires — Rae et al.
#: 2021, appendix A1.1 ("required words").
GOPHER_REQUIRED_WORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: int = 3,
    max_mean_word_len: int = 10,
) -> DataFrame:
    """The Gopher document-quality rule set (Rae et al. 2021, app. A1.1)
    — the standard pre-training corpus gate, re-expressed as pure
    Catalyst integer arithmetic so every flag is exact and
    oracle-checkable (no float ratio ever crosses an engine boundary;
    each threshold is an integer cross-multiplication):

    - ``ok_word_count``    — word count in [min_words, max_words]
    - ``ok_mean_word_len`` — mean word length in [3, 10]
                             (3·n_words ≤ Σlen ≤ 10·n_words)
    - ``ok_symbol_ratio``  — (# + …) per word ≤ 0.1  (10·symbols ≤ words)
    - ``ok_bullet_lines``  — ≤ 90 % of lines start with a bullet
    - ``ok_ellipsis_lines``— ≤ 30 % of lines end with an ellipsis
    - ``ok_alpha_words``   — ≥ 80 % of tokens contain a letter
    - ``ok_stopwords``     — ≥ 2 distinct Gopher required words present
    - ``pass_gopher``      — AND of all seven

    One map-only scan, zero shuffle, zero Python: at 100 TB this fuses
    into the parquet read and filters before anything downstream pays
    for a byte. Counts are also emitted so the gate is auditable."""
    c = F.col(text_col)
    base = (
        df.withColumn("__w", words(text_col))
        .withColumn("__t", tokens(text_col))
        .withColumn("__lines", F.split(c, "\n"))
        .withColumn("__padded", _padded(text_col))
    )
    w, t, lines = F.col("__w"), F.col("__t"), F.col("__lines")
    n_words = F.size(w)
    n_tokens = F.size(t)
    n_lines = F.size(lines)
    sum_word_len = F.aggregate(
        w, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    # symbols: '#' occurrences + ellipsis occurrences ('...' or '…');
    # replace '...' first so '…' never double-counts a char run.
    n_hash = _occurrences(c, "#")
    n_ellipsis = _occurrences(c, "...") + _occurrences(c, "…")
    bullet_lines = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"^[-*•]"))
    )
    ellipsis_lines = F.size(
        F.filter(lines, lambda l: F.rtrim(l).rlike(r"(\.\.\.|…)$"))
    )
    alpha_tokens = F.size(F.filter(t, lambda x: x.rlike("[A-Za-z]")))
    required_present = F.lit(0).cast("long")
    for rw in GOPHER_REQUIRED_WORDS:
        required_present = required_present + F.when(
            _occurrences(F.col("__padded"), f" {rw} ") > 0, 1
        ).otherwise(0)
    out = (
        base.withColumn("n_words", n_words.cast("long"))
        .withColumn("n_lines", n_lines.cast("long"))
        .withColumn("n_symbols", (n_hash + n_ellipsis).cast("long"))
        .withColumn("n_required_stopwords", required_present)
        .withColumn(
            "ok_word_count",
            (n_words >= min_words) & (n_words <= max_words),
        )
        .withColumn(
            "ok_mean_word_len",
            (n_words > 0)
            & (sum_word_len >= min_mean_word_len * n_words)
            & (sum_word_len <= max_mean_word_len * n_words),
        )
        .withColumn("ok_symbol_ratio", 10 * (n_hash + n_ellipsis) <= n_words)
        .withColumn("ok_bullet_lines", 10 * bullet_lines <= 9 * n_lines)
        .withColumn("ok_ellipsis_lines", 10 * ellipsis_lines <= 3 * n_lines)
        .withColumn(
            "ok_alpha_words",
            (n_tokens > 0) & (5 * alpha_tokens >= 4 * n_tokens),
        )
        .withColumn("ok_stopwords", required_present >= 2)
    )
    flags = [
        "ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
        "ok_bullet_lines", "ok_ellipsis_lines", "ok_alpha_words",
        "ok_stopwords",
    ]
    pass_all = F.lit(True)
    for fl in flags:
        pass_all = pass_all & F.col(fl)
    return out.withColumn("pass_gopher", pass_all).drop(
        "__w", "__t", "__lines", "__padded"
    )


def hashed_linear_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
    seed: str = "quality-v1",
) -> DataFrame:
    """fastText-shaped linear classifier inference (Joulin et al. 2016;
    the CCNet / GPT-3-style model-based quality filter): every word is
    hashed into a ``buckets``-wide feature space (the hashing trick —
    vocabulary-free, collisions share a weight BY BUCKET, exactly the
    trained model's semantics), each bucket carries a weight, and the
    document's logit is the sum of its words' bucket weights.

    Weights here are a deterministic stand-in derived from the bucket id
    (md5 → integer milli-weight in [-1000, 1000]); a TRAINED model swaps
    in a broadcast ``bucket → weight`` lookup-join or a literal CASE
    table — the Spark-side plumbing (hash → weight → per-doc sum →
    threshold) is identical and is what this operator exists to prove at
    scale: inference is a map-only scan fused into the parquet read,
    zero shuffle, zero Python. Integer milli-weights keep the logit
    exact (no float summation order), so the score is oracle-checkable
    bit-for-bit.

    Emits ``n_words``, ``logit_milli`` (sum of milli-weights),
    ``score_per_word`` (logit/1000/n_words — IEEE-exact division) and
    ``keep`` (logit ≥ 0)."""
    from ..functions.hashing import portable_hash60

    base = df.withColumn("__w", words(text_col))
    nw = F.size(F.col("__w"))

    def _weight(w: Column) -> Column:
        bucket = portable_hash60(w) % buckets
        return (
            portable_hash60(F.concat(F.lit(seed + ":"), bucket.cast("string")))
            % 2001
        ) - 1000

    logit = F.aggregate(
        F.col("__w"), F.lit(0).cast("long"), lambda acc, w: acc + _weight(w)
    )
    return (
        base.withColumn("n_words", nw.cast("long"))
        .withColumn("logit_milli", logit)
        .withColumn(
            "score_per_word",
            F.when(nw > 0, F.col("logit_milli") / 1000.0 / nw).otherwise(0.0),
        )
        .withColumn("keep", F.col("logit_milli") >= 0)
        .drop("__w")
    )


def tfidf_topk(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Top-k characteristic terms per document by tf-idf.

    Returns ``(id, term, tf, doc_freq, score, rank)`` with
    ``score = tf * (n_docs / doc_freq)`` — a RATIONAL idf (no log):
    IEEE multiply/divide are exactly specified, so the score is
    bit-identical on any engine, while ``ln`` is not correctly-rounded
    and may differ in the last ulp between libm implementations. The
    rational form is strictly monotone in ``ln(n/df)`` at fixed tf, so
    rare-term ordering is preserved; the tf/idf TRADE-OFF differs from
    the classic formula, which is fine for a deterministic
    keyword-extraction operator and essential for oracle parity.

    Shape at 100 TB: explode is map-side; tf aggregates on
    ``(id, term)`` (one shuffle); doc_freq aggregates tf on ``term``
    with map-side partial combine, and the tf⋈doc_freq join's hot keys
    (stop-words) are AQE-skew-splittable. A term-partition COUNT window
    would compute doc_freq from ONE tf pass, but a stop-word appearing
    in every document serializes n_docs rows through a single reducer —
    window partitions, unlike join partitions, cannot be skew-split, so
    the window form dies at corpus scale. The cost of the join form is
    that Catalyst re-derives the tf branch for doc_freq (second corpus
    scan); a production run materializes tf once (localCheckpoint or a
    table) and feeds both aggregates from the materialization. The
    corpus size joins in as a broadcast scalar; the final top-k is a
    rank-pushdown window per document. No driver collect."""
    w = df.select(F.col(id_col), F.explode(words(text_col)).alias("term"))
    # persisted: the doc_freq census and the score join both consume the
    # tf frame — unpersisted, the word explode + (id, term) aggregate
    # ran twice (round 14, guide §1.2)
    tf = scoped_persist(
        w.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    )
    doc_freq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(doc_freq, "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf") * (F.col("n_docs").cast("double") / F.col("doc_freq")),
        )
    )
    win = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "doc_freq", "score", "rank")
    )


def ngram_counts(
    df: DataFrame, text_col: str = "text", n: int = 2, k: int = 50
) -> DataFrame:
    """Corpus-level n-gram frequency table, top-``k`` by count — the
    language-model-adjacent census pass (vocabulary building, boilerplate
    discovery, contamination screening all start from it).

    Returns ``(ngram, n_occurrences)`` for the ``k`` most frequent
    word n-grams under a total order (count DESC, ngram ASC) so the
    boundary of the top-k is deterministic.

    Shape at 100 TB: n-grams are built per-row inside codegen (bound
    word array, ``transform`` over an index sequence — no UDF), exploded
    map-side, and counted with partial aggregation, so the shuffle
    carries one pre-combined row per (partition, distinct n-gram), not
    one per occurrence. The global top-k is ``ORDER BY ... LIMIT k``,
    which Spark executes as TakeOrderedAndProject: each partition keeps
    its own k-heap and only k rows per partition reach the driver-side
    merge — no global sort materializes."""
    base = df.select(words(text_col).alias("__w"))
    nw = F.size("__w")
    grams = F.when(
        nw >= n,
        F.transform(
            F.sequence(F.lit(1), nw - (n - 1)),
            lambda i: F.array_join(F.slice(F.col("__w"), i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        base.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("ngram").asc())
        .limit(k)
    )


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 4,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark decontamination: flag training documents that share any
    n-word shingle with an evaluation/benchmark document (the standard
    pre-training hygiene pass that keeps eval data out of the corpus).

    Returns one row per CONTAMINATED training doc:
    ``(id, n_shared_shingles, n_benchmark_docs)``.

    Both sides shingle once (distinct n-gram strings per doc), hash each
    shingle to an engine-portable 60-bit key (functions/hashing.py), and
    meet in an inverted-index equi-join on the 8-byte key — cost is
    proportional to documents + true overlaps, never pairwise. Benchmark
    suites are tiny relative to a 100 TB corpus, so by default the
    benchmark side is explicitly broadcast and the corpus never shuffles
    at all — the scan streams past a hashed eval-set and emits only
    hits. For an unusually large benchmark side (it must fit in executor
    memory to broadcast), pass ``broadcast_benchmark=False`` to fall
    back to a shuffled hash join, where AQE splits any hot-shingle
    skew."""
    from ..functions.hashing import portable_hash60
    from ..functions.text import shingle_strings_from_words, words as _words

    def exploded(df: DataFrame, prefix: str) -> DataFrame:
        base = df.select(
            F.col(id_col).alias(f"{prefix}_id"), F.col(text_col).alias("__t")
        ).withColumn("__w", _words(F.col("__t")))
        return base.select(
            f"{prefix}_id",
            F.explode(shingle_strings_from_words(F.col("__w"), n)).alias("__s"),
        ).select(f"{prefix}_id", portable_hash60(F.col("__s")).alias("__h"))

    t = exploded(train, "train")
    b = exploded(benchmark, "bench")
    if broadcast_benchmark:
        b = F.broadcast(b)
    return (
        t.join(b, "__h")
        .groupBy("train_id")
        .agg(
            F.countDistinct("__h").alias("n_shared_shingles"),
            F.countDistinct("bench_id").alias("n_benchmark_docs"),
        )
        .withColumnRenamed("train_id", id_col)
    )


def pseudonymize(
    df: DataFrame,
    surrogate_cols: list[str],
    mask_cols: list[str],
    keep_last: int = 4,
) -> DataFrame:
    """PII pseudonymization for training-data prep: each
    ``surrogate_cols`` column is replaced by its md5 digest (a stable
    join-safe pseudonym — the same raw value maps to the same surrogate
    across tables and runs, so referential structure survives), and each
    ``mask_cols`` column has every digit except the last ``keep_last``
    replaced by ``*`` (values with ≤ keep_last trailing chars pass
    through). Pure Catalyst string expressions — one codegen'd scan, no
    shuffle, no UDF; the same columns a 100 TB run would rewrite
    in-place during ingest."""
    out = df
    for c in surrogate_cols:
        out = out.withColumn(c, F.md5(F.col(c).cast("binary")))
    for c in mask_cols:
        ln = F.length(F.col(c))
        masked = F.concat(
            F.regexp_replace(
                F.col(c).substr(F.lit(1), ln - keep_last), "[0-9]", "*"
            ),
            F.col(c).substr(ln - keep_last + 1, F.lit(keep_last)),
        )
        out = out.withColumn(c, F.when(ln > keep_last, masked).otherwise(F.col(c)))
    return out


def bigram_lm_score(
    model_docs: DataFrame,
    score_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-LM quality scoring (the CCNet / Wikipedia-LM filtering
    recipe, bigram order): train add-one-smoothed bigram statistics on
    ``model_docs``, score every ``score_docs`` document by its mean
    bigram probability under that model — low scores flag
    gibberish/boilerplate relative to the reference corpus, exactly what
    the KenLM perplexity gate does in public pipeline papers (CCNet;
    Gopher's quality filters), with the LM swapped for a warehouse-
    computable one.

    Determinism policy (module standard): probabilities are RATIONAL —
    ``p(w2|w1) = (c(w1,w2) + 1) / (c(w1)·prefix occurrences + V)`` with
    V = model unigram vocabulary — and each bigram's probability is
    quantized to ``floor(p * 1e9)`` BEFORE the per-doc integer sum, so
    scores are bit-identical on any engine (no log, no float
    accumulation). Mean probability replaces perplexity's geometric
    mean: both are monotone quality signals, and the arithmetic mean
    needs no exp/log.

    Returns ``(id, n_bigrams, sum_p_nano, avg_p)`` — ``avg_p`` is the
    one double (single exact division). Docs with < 2 words score NULL
    avg_p with n_bigrams = 0.

    Scale shape: model counts are two map-side-combinable aggregates
    over exploded bigrams; scoring joins each doc bigram against the
    (w1, w2) count table and the w1 prefix table — hash joins on hashed
    string keys, AQE-skew-splittable on stop-word prefixes; V and the
    per-doc aggregate ride broadcast/one-shuffle respectively. Nothing
    is ever collected."""
    def _bigrams(df: DataFrame) -> DataFrame:
        w = df.select(F.col(id_col), words(text_col).alias("__w"))
        nw = F.size("__w")
        pairs = F.when(
            nw >= 2,
            F.transform(
                F.sequence(F.lit(1), nw - 1),
                lambda i: F.struct(
                    F.element_at("__w", i).alias("w1"),
                    F.element_at("__w", i + F.lit(1)).alias("w2"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        return w.select(
            id_col, F.explode(pairs).alias("__b")
        ).select(id_col, F.col("__b.w1").alias("w1"), F.col("__b.w2").alias("w2"))

    mb = _bigrams(model_docs)
    c2 = mb.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = mb.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = (
        model_docs.select(F.explode(words(text_col)).alias("w"))
        .agg(F.count_distinct("w").alias("v"))
    )  # 1 row — broadcast

    sb = _bigrams(score_docs)
    joined = (
        sb.join(c2, ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .join(F.broadcast(vocab))
    )
    p_nano = F.floor(
        (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1)).cast("double")
        / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v"))
        * F.lit(1_000_000_000.0)
    )
    per_doc = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum(p_nano).alias("sum_p_nano"),
    )
    # docs too short to form a bigram still get a row
    base = score_docs.select(id_col).join(per_doc, id_col, "left")
    return base.select(
        id_col,
        F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
        F.coalesce(F.col("sum_p_nano"), F.lit(0)).alias("sum_p_nano"),
        F.when(
            F.col("n_bigrams") > 0,
            F.col("sum_p_nano").cast("double")
            / F.lit(1_000_000_000.0)
            / F.col("n_bigrams"),
        ).alias("avg_p"),
    )


# Normalization character classes, shared verbatim with the DuckDB
# oracle twin (queries_sequence-style portability: literal characters,
# no engine-specific escapes; \x0B/\x0C live here, NOT in the
# whitespace class, because Java \s and RE2 \s disagree on them).
_STRIP_CLASS = (
    "[\x00-\x08\x0b\x0c\x0e-\x1f\x7f"  # C0 controls minus \t\n\r, DEL
    "​‌‍﻿]"        # zero-width + BOM
)
_WS_RUN = "[ \t\n\r]+"


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "norm_text",
    lowercase: bool = False,
) -> DataFrame:
    """C4-style text normalization as a pure-Catalyst projection — the
    first cleanup pass a web corpus gets before dedup/quality filters
    (control bytes and zero-width characters defeat exact/fingerprint
    dedup; whitespace variance defeats shingling):

    1. strip C0 control characters (except tab/newline/CR), DEL,
       zero-width (ZWSP/ZWNJ/ZWJ) and BOM;
    2. collapse every whitespace run (space/tab/newline/CR) to one
       space;
    3. trim; optionally lowercase.

    Appends ``out_col``; map-only (zero exchanges, zero Python rows) —
    at 100 TB this fuses into whatever scan feeds it. The character
    classes are literal-only so the same pattern strings run on any
    RE2/Java regex engine (``\\s`` is NOT portable: Java includes
    \\x0B, RE2 does not — \\x0B/\\x0C are stripped instead).
    """
    c = F.regexp_replace(F.col(text_col), _STRIP_CLASS, "")
    c = F.regexp_replace(c, _WS_RUN, " ")
    c = F.trim(c)
    if lowercase:
        c = F.lower(c)
    return df.withColumn(out_col, c)


def soft_dedup_weights(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """SoftDeDup-shaped duplicate REWEIGHTING (He et al., "SoftDedup:
    an Efficient Data Reweighting Method for Speeding Up Language Model
    Pre-training", ACL 2024): instead of DROPPING near-duplicates, every
    document keeps a sampling weight inversely proportional to its
    n-gram COMMONNESS, so highly duplicated content is down-sampled in
    training rather than discarded — the effective-epoch view of dedup.
    The paper scores commonness with an n-gram LM probability product;
    that is a float product (engine-divergent), so this operator uses
    the mean corpus occurrence count of the document's n-grams — the
    same monotone signal, kept as exact integers: a doc whose bigrams
    each occur once corpus-wide has commonness 1 (full weight); a doc
    duplicated k times has commonness ≥ k on every gram (weight ≤ 1/k).

    Emits per doc: ``n_grams`` (bigram tokens, with multiplicity),
    ``sum_freq`` (Σ global occurrence count of each gram token), and
    ``weight_nano = (scale·n_grams) div sum_freq`` — the sampling
    weight at nano scale, exact truncating integer division so the
    value is bit-identical on any engine. freq ≥ 1 per gram ⇒ weight ≤
    scale; gram-less docs (< n words) carry no duplication evidence and
    keep full weight. ``scale·n_grams`` stays in int64 up to ~9e9-gram
    documents; ``sum_freq`` up to ~9e18 (a 1e5-gram doc of grams each
    duplicated 1e13 times) before a wider accumulator is needed.

    Shape at 100 TB: grams are built inside codegen (bound word array +
    ``transform`` over an index sequence), immediately reduced to a
    60-bit portable hash, so only slim ``(doc_id, gram_hash)`` pairs
    ever leave the scan. One shuffle builds the census (partial-agg
    combine ⇒ one row per (partition, distinct gram) in flight), one
    sort-merge join brings counts back to the pairs, one partial-agg
    shuffle folds them per doc. Stop-gram keys (hot bigrams) skew the
    join-back exchange: the census side is one row per gram so SMJ
    streams them, and AQE skew-split handles the pairs side — same
    posture as the tf-idf census. The corpus is scanned twice (census +
    probe), which the inherent two-pass structure requires.
    """
    from ..functions.hashing import portable_hash60
    from ..functions.text import words

    base = df.select(F.col(id_col), words(text_col).alias("__w"))
    nw = F.size("__w")
    grams = F.when(
        nw >= n,
        F.transform(
            F.sequence(F.lit(1), nw - (n - 1)),
            lambda i: F.array_join(F.slice(F.col("__w"), i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # persisted (round 14): the census and the join-back probe are the
    # operator's two inherent passes — unpersisted they each re-ran the
    # word split + gram explode + hash from the scan; the cached form
    # pays one explode and re-reads slim 16-byte (id, hash) rows
    pairs = scoped_persist(base.select(
        F.col(id_col), F.explode(grams).alias("__g")
    ).select(
        F.col(id_col), portable_hash60(F.col("__g")).alias("__gh")
    ))
    census = pairs.groupBy("__gh").agg(F.count(F.lit(1)).alias("__freq"))
    per_doc = (
        pairs.join(census, "__gh")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("__freq").alias("sum_freq"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce(F.col("sum_freq"), F.lit(0)).cast("long").alias("sum_freq"),
            F.when(
                F.coalesce(F.col("sum_freq"), F.lit(0)) > 0,
                F.expr(f"CAST({scale} AS BIGINT) * n_grams div sum_freq"),
            )
            .otherwise(F.lit(scale))
            .cast("long")
            .alias("weight_nano"),
        )
    )


def dsir_importance(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
    ratio_cap: int = 1_000_000,
) -> DataFrame:
    """DSIR-shaped data selection (Xie et al., "Data Selection for
    Language Models via Importance Resampling", NeurIPS 2023): score
    every raw document by how much more likely its words are under a
    TARGET corpus's hashed bag-of-words model than under the raw
    corpus's own — the importance ratio that steers pretraining data
    toward a desired domain. The paper scores in log space and samples
    with Gumbel noise; logs and noise are engine-divergent, so this
    operator keeps the per-bucket ratio itself at micro scale via exact
    truncating long division (three-limb expansion keeps every
    intermediate in int64) and makes the keep decision deterministic:
    a document passes when its mean word-ratio exceeds 1 (score_micro ≥
    1e6 · n_words — i.e. its words are on average MORE likely under the
    target model than under the raw model).

    The per-bucket importance ratio is the self-normalized
        ratio(b) = [(cnt_t(b)+1)/(N_t+B)] ÷ [(cnt_r(b)+1)/(N_r+B)]
    (add-one smoothing; N = corpus word total, B = buckets) — the size
    prior (N_r+B)/(N_t+B) must stay in because the keep decision is an
    ABSOLUTE threshold at 1; without it a target that is a subset of
    raw scores every document below 1. It is computed as TWO micro-
    scale truncating divisions multiplied then rescaled — floor(
    floor(1e6·a/d) · floor(1e6·n2/d2) / 1e6) — each factor clamped at
    1e9 (ratio 1e3), so the combined ratio is capped at ``ratio_cap`` =
    1e6 and every intermediate fits int64: the factor product ≤ 1e18,
    per-word score ≤ 1e12, a per-doc sum safe to ~9e6 words/doc, and
    the three-limb division limbs ≤ 1e3·corpus-words (safe to ~9e15-
    word corpora). The double floor costs ≤ 2e-6 relative — and both
    engines floor identically, which is the property that matters.
    Clamping importance weights is the standard variance guard in
    importance resampling; here it doubles as the overflow guard.

    Shape at 100 TB: both count passes are explode → partial-agg
    shuffles whose distinct-key space is ``buckets`` (4096 rows — the
    combine collapses everything map-side; the exchange is O(buckets ·
    partitions)). The ratio table is O(buckets) and BROADCAST to the
    scoring join, so scoring is map-side: one final partial-agg shuffle
    on doc_id. The target corpus is typically a small quality sample —
    scanned once; the raw corpus is scanned twice (its own counts +
    scoring), inherent to self-normalized importance weights.
    """
    from ..functions.hashing import portable_hash60
    from ..functions.text import words

    def bucketed(df: DataFrame) -> DataFrame:
        ws = df.select(F.explode(words(text_col)).alias("__word"))
        return ws.select(
            F.pmod(portable_hash60(F.col("__word")), F.lit(buckets)).alias("__b")
        )

    fcap = max(1, int(ratio_cap**0.5))  # per-factor clamp; combined = fcap²

    def _micro_div(a: str, d: str) -> str:
        # floor(1e6·a/d) via three exact int64 limbs, clamped at 1e6·fcap
        return (
            f"CASE WHEN ({a} div {d}) >= {fcap}"
            f" THEN CAST(1000000 AS BIGINT) * {fcap}"
            f" ELSE 1000000 * ({a} div {d})"
            f" + 1000 * ((1000 * ({a} % {d})) div {d})"
            f" + ((1000 * ((1000 * ({a} % {d})) % {d})) div {d}) END"
        )

    cnt_t = bucketed(target).groupBy("__b").agg(F.count(F.lit(1)).alias("__ct"))
    cnt_r = bucketed(raw).groupBy("__b").agg(F.count(F.lit(1)).alias("__cr"))
    tot = (
        cnt_t.agg(F.coalesce(F.sum("__ct"), F.lit(0)).alias("__nt"))
        .crossJoin(cnt_r.agg(F.coalesce(F.sum("__cr"), F.lit(0)).alias("__nr")))
    )
    ratios = (
        cnt_t.join(cnt_r, "__b", "full")
        .crossJoin(F.broadcast(tot))
        .select(
            "__b",
            (F.coalesce(F.col("__ct"), F.lit(0)) + 1).alias("__a"),
            (F.coalesce(F.col("__cr"), F.lit(0)) + 1).alias("__d"),
            (F.col("__nr") + buckets).alias("__n2"),
            (F.col("__nt") + buckets).alias("__d2"),
        )
        .select(
            "__b",
            F.expr(
                f"(({_micro_div('__a', '__d')}) * ({_micro_div('__n2', '__d2')}))"
                " div 1000000"
            )
            .cast("long")
            .alias("__ratio_micro"),
        )
    )
    scored = (
        raw.select(F.col(id_col), F.explode(words(text_col)).alias("__word"))
        .select(
            F.col(id_col),
            F.pmod(portable_hash60(F.col("__word")), F.lit(buckets)).alias("__b"),
        )
        .join(F.broadcast(ratios), "__b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("__ratio_micro").alias("score_micro"),
        )
    )
    return (
        raw.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_words"), F.lit(0)).cast("long").alias("n_words"),
            F.coalesce(F.col("score_micro"), F.lit(0)).cast("long").alias(
                "score_micro"
            ),
            (
                (F.coalesce(F.col("n_words"), F.lit(0)) > 0)
                & (
                    F.coalesce(F.col("score_micro"), F.lit(0))
                    >= F.lit(1_000_000).cast("long")
                    * F.coalesce(F.col("n_words"), F.lit(0))
                )
            ).alias("keep"),
        )
    )
