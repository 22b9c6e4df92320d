"""BPE training: golden parity with a from-the-paper reference
implementation (Sennrich et al. 2016, alg. 1), encoding round-trips,
and the plan-shape pins for the no-UDF claim."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from olist_snowflake_dbt_spark.operators.tokenizer import (
    bpe_segment,
    bpe_train,
    encode_symbols,
    merge_expr,
    pair_freqs,
    symbols_of,
    word_freq_table,
)


# --- reference implementation (paper pseudocode, dict-based) ---------

def _ref_bpe(word_freqs: dict[str, int], num_merges: int, min_freq: int = 2):
    vocab = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for rank in range(1, num_merges + 1):
        pairs: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        (lhs, rhs), freq = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if freq < min_freq:
            break
        merges.append((rank, lhs, rhs, lhs + rhs, freq))
        nxt: dict[tuple, int] = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            nxt[t] = nxt.get(t, 0) + f
        vocab = nxt
    return merges


def _train_both(spark, corpus: list[str], num_merges: int, min_freq: int = 2):
    df = spark.createDataFrame([(t,) for t in corpus], "text string")
    got = [
        (r.merge_rank, r.lhs, r.rhs, r.merged, r.freq)
        for r in bpe_train(df, "text", num_merges, min_freq)
        .orderBy("merge_rank")
        .collect()
    ]
    wf: Counter = Counter(
        w for t in corpus for w in t.lower().split() if w
    )
    want = _ref_bpe(dict(wf), num_merges, min_freq)
    return got, want


class TestBpeGoldenParity:
    def test_classic_corpus(self, spark):
        # the paper's flavor of example: low/lower/newest/widest
        corpus = ["low low low lower lower newest newest newest",
                  "newest newest widest widest widest low"]
        got, want = _train_both(spark, corpus, 8)
        assert got == want and len(got) == 8

    def test_repeated_symbol_runs(self, spark):
        # odd/even runs of one char: the leftmost-pairing edge the
        # string-replace encoding must reproduce exactly
        corpus = ["aaaaa aaaa aaa aa a", "aaaaa aaa baaab"]
        got, want = _train_both(spark, corpus, 6, min_freq=1)
        assert got == want

    def test_early_stop_under_min_freq(self, spark):
        corpus = ["ab ab cd"]
        got, want = _train_both(spark, corpus, 10, min_freq=2)
        assert got == want
        assert len(got) < 10  # stopped when best pair fell under 2

    def test_merged_symbols_participate_in_later_merges(self, spark):
        corpus = ["abab abab abab abcd"]
        got, want = _train_both(spark, corpus, 4, min_freq=1)
        assert got == want
        merged = {m[3] for m in got}
        assert "abab" in merged or "aba" in merged  # multi-level merge


class TestEncodingPrimitives:
    def test_encode_decode_roundtrip(self, spark):
        df = spark.createDataFrame(
            [("abc",), ("a",), ("aa",)], "w string"
        ).select(symbols_of(encode_symbols(F.col("w"))).alias("s"))
        assert [r.s for r in df.collect()] == [["a", "b", "c"], ["a"], ["a", "a"]]

    def test_merge_is_leftmost_nonoverlapping(self, spark):
        df = spark.createDataFrame([("aaaaa",)], "w string").select(
            symbols_of(
                merge_expr(encode_symbols(F.col("w")), "a", "a")
            ).alias("s")
        )
        assert df.collect()[0].s == ["aa", "aa", "a"]

    def test_merge_requires_exact_symbol_boundaries(self, spark):
        # symbols (a, ab): pair (a,a) must NOT fire inside 'ab'
        df = spark.createDataFrame([("||a||ab||",)], "enc string").select(
            symbols_of(merge_expr(F.col("enc"), "a", "a")).alias("s")
        )
        assert df.collect()[0].s == ["a", "ab"]

    def test_pair_freqs_counts_positions_weighted(self, spark):
        vocab = spark.createDataFrame(
            [(3, "||a||a||a||"), (2, "||a||b||")], "freq long, enc string"
        )
        got = {
            (r.lhs, r.rhs): r.freq for r in pair_freqs(vocab).collect()
        }
        assert got == {("a", "a"): 6, ("a", "b"): 2}


class TestSegment:
    def test_segment_applies_merges_in_order(self, spark):
        df = spark.createDataFrame([("low lower",)], "text string")
        out = bpe_segment(df, [("l", "o"), ("lo", "w")], "text").collect()[0]
        assert out.tokens == ["low", "low", "e", "r"]
        assert out.n_tokens == 4

    def test_segment_accepts_trained_table(self, spark):
        df = spark.createDataFrame(
            [("low low low lower",)], "text string"
        )
        merges = bpe_train(df, "text", 3, min_freq=1)
        out = bpe_segment(df, merges, "text").collect()[0]
        assert "".join(out.tokens) == "lowlowlowlower"  # lossless
        assert out.n_tokens < len("lowlowlowlower")     # actually merged


def test_training_plan_has_no_python_rows(spark):
    """Pair counting and merge application are pure Catalyst: no
    BatchEvalPython / ArrowEvalPython anywhere in the per-iteration
    plans (the corpus-scale legs of the loop)."""
    df = spark.createDataFrame([("low lower",)], "text string")
    vocab = word_freq_table(df, "text")
    plan1 = pair_freqs(vocab)._jdf.queryExecution().executedPlan().toString()
    merged = vocab.withColumn("enc", merge_expr(F.col("enc"), "l", "o"))
    plan2 = merged._jdf.queryExecution().executedPlan().toString()
    for plan in (plan1, plan2):
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
