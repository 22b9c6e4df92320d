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


# --- batched trainer (round 11) ---------------------------------------

def _ref_bpe_batched(
    word_freqs: dict[str, int],
    num_merges: int,
    min_freq: int,
    batch: int,
    window: int,
):
    """Python reference of the BATCHED algorithm spec: per round, top-
    ``window`` pairs of the PRE-round counts, greedy symbol-disjoint
    acceptance of up to ``batch``, fused application."""
    vocab = {tuple(w): f for w, f in word_freqs.items()}
    merges: list = []
    rounds = -(-num_merges // batch)
    for _ in range(rounds):
        pairs: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        cand = sorted(
            ((p, c) for p, c in pairs.items() if c >= min_freq),
            key=lambda kv: (-kv[1], kv[0][0], kv[0][1]),
        )[:window]
        accepted, used = [], set()
        for (lhs, rhs), c in cand:
            if len(accepted) == batch:
                break
            if used & {lhs, rhs, lhs + rhs}:
                continue
            accepted.append((lhs, rhs, c))
            used |= {lhs, rhs, lhs + rhs}
        if not accepted:
            break
        for lhs, rhs, c in accepted:
            merges.append((len(merges) + 1, lhs, rhs, lhs + rhs, c))
        for lhs, rhs, _c in accepted:
            nxt: dict[tuple, int] = {}
            for syms, f in vocab.items():
                out, i = [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == lhs
                        and syms[i + 1] == rhs
                    ):
                        out.append(lhs + rhs)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                t = tuple(out)
                nxt[t] = nxt.get(t, 0) + f
            vocab = nxt
    merges = merges[:num_merges]
    return [(i + 1, l, r, m, f) for i, (_, l, r, m, f) in enumerate(merges)]


def _train_batched(spark, corpus, num_merges, min_freq=2, batch=4, window=16):
    from olist_snowflake_dbt_spark.operators.tokenizer import (
        bpe_train_batched,
    )

    df = spark.createDataFrame([(t,) for t in corpus], "text string")
    got = [
        (r.merge_rank, r.lhs, r.rhs, r.merged, r.freq)
        for r in bpe_train_batched(
            df, "text", num_merges, min_freq, batch, window
        )
        .orderBy("merge_rank")
        .collect()
    ]
    wf: Counter = Counter(w for t in corpus for w in t.lower().split() if w)
    want = _ref_bpe_batched(dict(wf), num_merges, min_freq, batch, window)
    return got, want


class TestBpeBatched:
    def test_batch1_identical_to_sequential(self, spark):
        """batch=1 degenerates to one argmax per round — bit-identical
        to the sequential trainer on any corpus."""
        from olist_snowflake_dbt_spark.operators.tokenizer import (
            bpe_train_batched,
        )

        corpus = ["low low low lower lower newest newest newest",
                  "newest newest widest widest widest low",
                  "abab abab abab cd cd"]
        df = spark.createDataFrame([(t,) for t in corpus], "text string")
        seq = [
            tuple(r) for r in bpe_train(df, "text", 6, 1)
            .orderBy("merge_rank").collect()
        ]
        b1 = [
            tuple(r) for r in bpe_train_batched(df, "text", 6, 1, batch=1)
            .orderBy("merge_rank").collect()
        ]
        assert b1 == seq and len(seq) == 6

    def test_golden_parity_with_batched_reference(self, spark):
        got, want = _train_batched(
            spark,
            ["low low low lower lower newest newest newest",
             "newest newest widest widest widest low"],
            8, min_freq=2, batch=4,
        )
        # round 2's slots partially conflict on this corpus, so fewer
        # than 8 merges come back — per the fixed-round contract
        assert got == want and 4 <= len(got) <= 8

    def test_disjoint_corpus_matches_sequential(self, spark):
        """When every round's accepted pairs never interact (symbol-
        disjoint AND no created pair outranks later picks), batched ==
        sequential — the exactness case the operator documents."""
        corpus = ["ab ab ab ab cd cd cd ef ef gh"]
        got, want = _train_batched(spark, corpus, 4, min_freq=1, batch=4)
        got_seq, want_seq = _train_both(spark, corpus, 4, min_freq=1)
        assert got == want
        # same merge SET and same ranks here: (a,b),(c,d),(e,f),(g,h)
        assert got == got_seq == want_seq

    def test_documented_divergence_on_created_pairs(self, spark):
        """abab-heavy corpus: sequential merge #2 is the CREATED pair
        (ab,ab); batched batch=2 scores against pre-round counts and
        picks (c,d) instead. Both match their own spec — the divergence
        the operator docstring documents."""
        corpus = ["abab abab abab cd cd"]
        got_b, want_b = _train_batched(spark, corpus, 2, min_freq=1, batch=2)
        got_s, want_s = _train_both(spark, corpus, 2, min_freq=1)
        assert got_b == want_b and got_s == want_s
        assert got_b[0][1:3] == ("a", "b") and got_s[0][1:3] == ("a", "b")
        assert got_s[1][1:3] == ("ab", "ab")   # sequential: created pair
        assert got_b[1][1:3] == ("c", "d")     # batched: pre-round pair
        assert got_b != got_s
        # and the divergence all the way down to TOKENIZATIONS: encoding
        # the same corpus with each learned table yields different token
        # streams — pinned exactly, so the semantic gap is documented in
        # outputs, not just in merge-table rows
        from olist_snowflake_dbt_spark.operators.tokenizer import (
            bpe_segment,
        )

        df = spark.createDataFrame([(corpus[0],)], "text string")

        def toks(table):
            seg = bpe_segment(df, [(l, r) for _, l, r, _, _ in table], "text")
            return seg.select("tokens").collect()[0][0]

        assert toks(got_s) == ["abab", "abab", "abab", "c", "d", "c", "d"]
        assert toks(got_b) == ["ab", "ab", "ab", "ab", "ab", "ab", "cd", "cd"]

    def test_output_symbol_rule_parity_on_overlap_heavy_corpus(self, spark):
        """Round-12 rule change (round-11 advisory): acceptance is
        disjoint over {lhs, rhs, merged} — the merged OUTPUT symbol
        joins the conflict set, so no accepted pattern can match text
        another same-round replacement created. Overlap-heavy corpus
        (runs, abab, nested ab/bc/abc words) at batch=3: the Spark
        trainer, the Python reference, and (via the driver) the SQL
        oracle all replay the same strengthened rule."""
        corpus = [
            "aaaa aaaa aa aab abb aabb abab abab",
            "bc bc bc abc abc aabc abbc zbc zb",
        ]
        got, want = _train_batched(
            spark, corpus, 10, min_freq=1, batch=3, window=12
        )
        assert got == want and len(got) >= 6

    def test_driver_rounds_scale_as_merges_over_batch(self, spark, monkeypatch):
        """8 merges at batch=4 touch the driver TWICE (one candidate
        TakeOrdered per round) — the coordination-cost claim."""
        import olist_snowflake_dbt_spark.operators.tokenizer as tok

        calls = {"n": 0}
        real = tok.pair_freqs

        def counting(vocab):
            calls["n"] += 1
            return real(vocab)

        monkeypatch.setattr(tok, "pair_freqs", counting)
        corpus = ["low low low lower lower newest newest newest",
                  "newest newest widest widest widest low"]
        df = spark.createDataFrame([(t,) for t in corpus], "text string")
        out = tok.bpe_train_batched(df, "text", 8, 2, batch=4)
        assert out.count() >= 4
        assert calls["n"] == 2

    def test_guards(self, spark):
        import pytest as _pytest

        from olist_snowflake_dbt_spark.operators.tokenizer import (
            bpe_train_batched,
        )

        df = spark.createDataFrame([("ab",)], "text string")
        with _pytest.raises(ValueError, match="batch"):
            bpe_train_batched(df, "text", 4, 1, batch=0)
        with _pytest.raises(ValueError, match="candidate_window"):
            bpe_train_batched(df, "text", 4, 1, batch=8, candidate_window=2)
        with _pytest.raises(ValueError, match="num_merges"):
            bpe_train_batched(df, "text", 0, 1)


class TestOovStats:
    def test_counts_and_zero_word_docs(self, spark):
        from olist_snowflake_dbt_spark.operators.tokenizer import oov_stats

        rows = [
            (1, "aa aa aa bb"),   # aa x3, bb x1
            (2, "aa cc dd"),      # cc/dd rare
            (3, "!!!"),           # zero words
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        # vocab_size=2 -> top-2 by freq: aa (4) then bb/cc/dd all tie at
        # 1 -> 'bb' wins the word tie-break
        out = {
            r.doc_id: (r.n_words, r.n_oov, r.n_distinct_oov, r.oov_per_mille)
            for r in oov_stats(df, "text", "doc_id", vocab_size=2).collect()
        }
        assert out[1] == (4, 0, 0, 0)
        assert out[2] == (3, 2, 2, 666)
        assert out[3] == (0, 0, 0, 0)

    def test_full_vocab_means_zero_oov(self, spark):
        from olist_snowflake_dbt_spark.operators.tokenizer import oov_stats

        df = spark.createDataFrame(
            [(i, f"w{i % 5} shared") for i in range(20)],
            "doc_id long, text string",
        )
        out = oov_stats(df, "text", "doc_id", vocab_size=100).collect()
        assert all(r.n_oov == 0 and r.oov_per_mille == 0 for r in out)
