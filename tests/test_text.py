from __future__ import annotations

from pyspark.sql import functions as F

from olist_snowflake_dbt_spark.functions.text import (
    fingerprint,
    normalize,
    token_count,
    word_shingles,
    words,
)
from olist_snowflake_dbt_spark.operators.text import (
    decontaminate,
    language_id,
    pseudonymize,
    quality_score,
    tfidf_topk,
    token_stats,
)


def test_normalize_and_fingerprint(spark):
    df = spark.createDataFrame(
        [("Hello,  WORLD!",), ("hello world",)], "text string")
    rows = df.select(normalize("text").alias("n"), fingerprint("text").alias("f")).collect()
    assert rows[0].n == rows[1].n == "hello world"
    assert rows[0].f == rows[1].f


def test_tokens_and_words(spark):
    df = spark.createDataFrame([("Fast, slow; 42 things",)], "text string")
    r = df.select(
        token_count("text").alias("n"),
        words("text").alias("w"),
    ).collect()[0]
    assert r.n == 4
    assert r.w == ["fast", "slow", "42", "things"]


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",), ("",)], "text string")
    rows = df.select(word_shingles("text", 3).alias("s")).collect()
    assert rows[0].s == ["a b c", "b c d"]
    assert rows[1].s == ["a b"]  # shorter than n → single shingle
    assert rows[2].s == []


def test_language_id_clear_cases(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog sat on the mat in the sun"),
            (2, "el perro y la casa de la madre en un lugar"),
            (3, "der hund und die katze ist von den bergen mit zu"),
            (4, "le chat et les chiens est dans une maison pour le roi"),
            (5, "我的不是这个人在和有了的是"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.predicted_lang for r in language_id(df).collect()}
    assert out == {1: "en", 2: "es", 3: "de", 4: "fr", 5: "zh"}


def test_quality_score_features(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again and again today"),
         (2, "!!! ??? ... ;;; :::"),
         (3, "")],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in quality_score(df, "text").collect()}
    assert rows[1].n_tokens == 13
    assert rows[1].punct_ratio == 0.0
    assert rows[1].quality > 0.5
    assert rows[2].punct_ratio > 0.5
    assert rows[2].quality == 0.0  # punct-saturated
    assert rows[3].n_tokens == 0 and rows[3].quality == 0.0


def test_token_stats_bpe_regex(spark):
    df = spark.createDataFrame([(1, "hello, world 42!")], "doc_id long, text string")
    r = token_stats(df, "text").collect()[0]
    assert r.n_tokens == 3
    # hello , world 4 2 !  → 6 subword tokens (digits split singly)
    assert r.n_subword_tokens == 6
    assert r.n_chars_measured == 16


def test_tfidf_topk_ranks_rare_terms_first(spark):
    # "zebra" appears once in doc 1 only (df=1); "common" is in all docs
    # (df=3) — at equal tf the rarer term must outrank the common one.
    df = spark.createDataFrame(
        [
            (1, "common zebra common"),
            (2, "common apple apple"),
            (3, "common banana"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r.doc_id, r.rank): r
        for r in tfidf_topk(df, "text", "doc_id", 2).collect()
    }
    assert out[(1, 1)].term == "zebra"  # tf=1 * 3/1 = 3.0 beats tf=2 * 3/3 = 2.0
    assert out[(1, 1)].score == 3.0
    assert out[(1, 2)].term == "common" and out[(1, 2)].score == 2.0
    assert out[(2, 1)].term == "apple" and out[(2, 1)].tf == 2
    # every doc gets at most k rows, ranks are 1..k with no gaps
    assert sorted(k[1] for k in out if k[0] == 3) == [1, 2]


def test_decontaminate_flags_shared_ngrams_only(spark):
    # train doc 10 shares the benchmark's 4-gram verbatim; doc 11 shares
    # only single words (no 4-gram) and must NOT be flagged.
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (10, "intro text then the quick brown fox appears here"),
            (11, "quick dog lazy fox but never four in a row"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in decontaminate(train, bench, "text", "doc_id", 4).collect()}
    assert set(rows) == {10}
    assert rows[10].n_shared_shingles == 1  # "the quick brown fox"
    assert rows[10].n_benchmark_docs == 1


def test_pseudonymize_masks_and_surrogates(spark):
    df = spark.createDataFrame(
        [(1, "Alice Smith", "415-555-0199"), (2, "Bob", "99")],
        "id long, name string, phone string",
    )
    rows = {r.id: r for r in pseudonymize(df, ["name"], ["phone"]).collect()}
    assert rows[1].phone == "***-***-0199"
    assert rows[2].phone == "99"  # shorter than keep_last: untouched
    # surrogate is a stable md5, not the raw value
    import hashlib

    assert rows[1].name == hashlib.md5(b"Alice Smith").hexdigest()
    assert rows[2].name == hashlib.md5(b"Bob").hexdigest()


def test_repetition_stats_flags_degenerate_docs(spark):
    from olist_snowflake_dbt_spark.operators.text import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),          # one word repeated
            (2, "all words here are different"),  # no repetition
            (3, "a b a b a b"),                  # repeated 2-grams
            (4, ""),                             # empty: scores 0
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert rows[1].dup_word_frac == 0.75 and rows[1].dup_2gram_frac == 1.0 - 1 / 3
    assert rows[2].dup_word_frac == 0.0 and rows[2].dup_2gram_frac == 0.0
    assert rows[3].dup_word_frac == 1.0 - 2 / 6  # a,b distinct of 6
    # 5 bigrams: "a b" x3 + "b a" x2 -> 2 distinct -> 0.6 duplicated
    assert rows[3].dup_2gram_frac == 1.0 - 2 / 5  # noqa: keep 1-x form
    assert rows[4].n_words == 0 and rows[4].dup_word_frac == 0.0


def test_decontaminate_join_strategy_invariance(spark):
    # broadcast and shuffled paths must produce identical verdicts
    import random

    random.seed(11)
    vocab = [f"w{i}" for i in range(30)]
    docs = [
        (i, " ".join(random.choice(vocab) for _ in range(25)))
        for i in range(60)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    bench = df.filter(F.col("doc_id") % 10 == 0)
    train = df.filter(F.col("doc_id") % 10 != 0)
    a = sorted(map(tuple, decontaminate(train, bench, n=3).collect()))
    b = sorted(map(tuple, decontaminate(
        train, bench, n=3, broadcast_benchmark=False).collect()))
    assert a == b and len(a) > 0


def test_ngram_counts_exact_and_tiebreak(spark):
    from olist_snowflake_dbt_spark.operators.text import ngram_counts

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the cat"),
            (2, "the cat ran"),
            (3, "solo"),
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["ngram"]: r["n_occurrences"]
        for r in ngram_counts(docs, "text", n=2, k=100).collect()
    }
    # doc1 bigrams: the cat / cat sat / sat on / on the / the cat
    # doc2 bigrams: the cat / cat ran; docs 3-4 contribute none
    assert out["the cat"] == 3
    assert out["cat sat"] == 1
    assert out["cat ran"] == 1
    assert "solo" not in out  # single-word doc yields no bigram

    # top-k boundary is deterministic: ties broken by ngram ASC
    top = ngram_counts(docs, "text", n=2, k=2).collect()
    assert [r["ngram"] for r in top] == ["the cat", "cat ran"]


def test_gopher_rules_flags(spark):
    from olist_snowflake_dbt_spark.operators.text import gopher_rules

    good = "The quick brown fox jumps over the lazy dog and runs to be " \
           "part of the pack with plenty of words that have normal shape " \
           "and length so every rule here passes cleanly today " * 2
    bullets = "- one\n- two\n- three\n- four"
    dots = "first line...\nsecond line…\nthird"
    symbols = "# # # # tag"
    df = spark.createDataFrame(
        [(1, good), (2, bullets), (3, dots), (4, symbols), (5, "")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in gopher_rules(df, "text").collect()}
    assert got[1].pass_gopher
    assert got[1].ok_word_count and got[1].ok_stopwords and got[1].ok_alpha_words
    # 4/4 bullet lines > 90 % → fails the bullet rule (and word count)
    assert not got[2].ok_bullet_lines and not got[2].pass_gopher
    # 2/3 ellipsis-terminated lines > 30 %
    assert not got[3].ok_ellipsis_lines
    # 4 symbols vs 5 words → ratio 0.8 > 0.1
    assert not got[4].ok_symbol_ratio
    # empty doc fails length/alpha/stopword rules but must not crash
    assert not got[5].pass_gopher and got[5].n_words == 0


def test_gopher_rules_integer_thresholds_are_exact(spark):
    from olist_snowflake_dbt_spark.operators.text import gopher_rules

    # exactly at the boundary: 10 * symbols == n_words passes (≤), one
    # more symbol fails — no float epsilon anywhere
    at = ("w " * 10).strip() + " #"           # 11 words? no: '#' not a word
    df = spark.createDataFrame([(1, at)], "doc_id long, text string")
    r = gopher_rules(df, "text").collect()[0]
    assert r.n_words == 10 and r.n_symbols == 1 and r.ok_symbol_ratio
    df2 = spark.createDataFrame([(1, at + " #")], "doc_id long, text string")
    r2 = gopher_rules(df2, "text").collect()[0]
    assert r2.n_symbols == 2 and not r2.ok_symbol_ratio


class TestNormalizeText:
    def _norm(self, spark, raw, **kw):
        from olist_snowflake_dbt_spark.operators.text import normalize_text

        df = spark.createDataFrame([(raw,)], "text string")
        return normalize_text(df, **kw).collect()[0]["norm_text"]

    def test_strips_controls_and_zero_width(self, spark):
        raw = "a\x01b\x00c​d‌‍﻿e"
        assert self._norm(spark, raw) == "abcde"

    def test_collapses_whitespace_runs_and_trims(self, spark):
        raw = "  hello\t\t world \n\r again  "
        assert self._norm(spark, raw) == "hello world again"

    def test_keeps_tab_newline_as_separators_not_stripped(self, spark):
        """Tab/newline are whitespace (become spaces), NOT stripped
        like controls — 'a\\tb' must stay two words."""
        assert self._norm(spark, "a\tb") == "a b"
        assert self._norm(spark, "a\x01b") == "ab"

    def test_lowercase_opt_in(self, spark):
        assert self._norm(spark, "MiXeD", lowercase=True) == "mixed"
        assert self._norm(spark, "MiXeD") == "MiXeD"

    def test_idempotent(self, spark):
        from olist_snowflake_dbt_spark.operators.text import normalize_text

        raw = " x​  y\t"
        df = spark.createDataFrame([(raw,)], "text string")
        once = normalize_text(df, out_col="n1")
        twice = normalize_text(once, text_col="n1", out_col="n2").collect()[0]
        assert twice["n1"] == twice["n2"] == "x y"

    def test_map_only_plan(self, spark):
        from olist_snowflake_dbt_spark.operators.text import normalize_text

        df = spark.createDataFrame([("a",)], "text string")
        plan = (
            normalize_text(df)._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan and "Python" not in plan


# ---------------------------------------------------------------------
# round 13: SoftDeDup reweighting + DSIR importance selection
# ---------------------------------------------------------------------


def test_soft_dedup_weights_inverse_to_duplication(spark):
    from olist_snowflake_dbt_spark.operators.text import soft_dedup_weights

    # one unique doc (disjoint vocab) + one doc duplicated 4x: every
    # bigram of the duplicated text occurs exactly 4x corpus-wide, so
    # its weight must be exactly scale/4; the unique doc keeps full
    # weight.
    dup = "alpha beta gamma delta epsilon zeta"
    rows = [(0, "unique solo vocabulary nothing shared here")] + [
        (i, dup) for i in range(1, 5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in soft_dedup_weights(df).collect()}
    assert out[0].weight_nano == 1_000_000_000
    assert out[0].n_grams == 5 and out[0].sum_freq == 5
    for i in range(1, 5):
        assert out[i].weight_nano == 250_000_000  # 1/4 at nano scale
        assert out[i].sum_freq == out[i].n_grams * 4


def test_soft_dedup_weights_gramless_docs_keep_full_weight(spark):
    from olist_snowflake_dbt_spark.operators.text import soft_dedup_weights

    df = spark.createDataFrame(
        [(1, "oneword"), (2, ""), (3, "...!!!")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in soft_dedup_weights(df).collect()}
    for i in (1, 2, 3):
        assert out[i].n_grams == 0
        assert out[i].sum_freq == 0
        assert out[i].weight_nano == 1_000_000_000


def test_dsir_importance_separates_target_vocab(spark):
    from olist_snowflake_dbt_spark.operators.text import dsir_importance

    # disjoint vocabularies: medical target vs web-spam raw filler.
    # Texts are repeated x50 so counts dwarf the +1/+B smoothing (the
    # operator smooths over `buckets`=4096 cells; a 6-word fixture
    # would sit entirely inside the smoothing floor).
    med = "patient dosage clinical trial symptom diagnosis " * 50
    spam = "casino jackpot bonus spins winner lucky " * 50
    raw_rows = [(i, med) for i in range(2)] + [
        (i, spam) for i in range(2, 15)
    ] + [(15, "")]
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    target = spark.createDataFrame(
        [(100 + i, med) for i in range(3)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in dsir_importance(raw, target).collect()}
    for i in range(2):
        assert out[i].keep, "target-vocab doc must pass the mean-ratio gate"
    for i in range(2, 15):
        assert not out[i].keep, "off-target doc must fail the gate"
    assert not out[15].keep and out[15].n_words == 0
    # scores are strictly separated
    assert min(out[i].score_micro for i in range(2)) > max(
        out[i].score_micro for i in range(2, 15)
    )


def test_dsir_importance_ratio_clamp_is_exact(spark):
    from olist_snowflake_dbt_spark.functions.hashing import portable_hash60
    from olist_snowflake_dbt_spark.operators.text import dsir_importance

    # a word that exists ONLY in the target, repeated enough to trip
    # the per-factor clamp (q = a div d = 5001 ≥ 1000): the bucket's
    # factor1 pins at 1e9 and the combined ratio is the exact python
    # mirror below — proving both the clamp path and the limb math.
    raw = spark.createDataFrame(
        [(0, "plainword " * 10)], "doc_id long, text string"
    )
    target = spark.createDataFrame(
        [(1, "rareword " * 5000)], "doc_id long, text string"
    )
    out = dsir_importance(raw, target).collect()[0]

    def micro_div(a, d, fcap=1000):
        if a // d >= fcap:
            return 1_000_000 * fcap
        r = a % d
        return (
            1_000_000 * (a // d)
            + 1000 * ((1000 * r) // d)
            + (1000 * ((1000 * r) % d)) // d
        )

    # plainword's bucket: ct=0 (not in target) unless hash-colliding
    # with rareword's bucket — the vocab is chosen not to collide.
    b_plain = None
    df = spark.createDataFrame([("plainword",), ("rareword",)], "w string")
    h = {
        r.w: r.b
        for r in df.select(
            "w", (portable_hash60(F.col("w")) % 4096).alias("b")
        ).collect()
    }
    assert h["plainword"] != h["rareword"]
    nt, nr = 5000, 10
    expected = (
        micro_div(0 + 1, 10 + 1) * micro_div(nr + 4096, nt + 4096)
    ) // 1_000_000
    assert out.score_micro == 10 * expected
    assert not out.keep
