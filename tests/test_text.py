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
    language_id,
    quality_score,
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
