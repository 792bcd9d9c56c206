"""BPE merge-training: semantics vs an independent in-Python trainer,
greedy-fold edge cases, lazy-plan hygiene, and cache release (the
IVF-probe lesson applied to the new operator up front).
"""

from __future__ import annotations

import collections
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def _reference_bpe(texts, n_merges):
    """Independent scalar trainer (same tiebreak: count desc, pair asc)."""
    freq = collections.Counter()
    for t in texts:
        for w in t.split():
            if w:
                freq[w] += 1
    vocab = {w: list(w) for w in freq}
    merges = []
    for it in range(n_merges):
        pc = collections.Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += freq[w]
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((it + 1, a, b, cnt))
        for w, syms in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            vocab[w] = out
    return merges


def test_bpe_train_matches_reference_trainer(spark, sf_dir):
    from pygdf_spark.operators.bpe import bpe_train
    from pygdf_spark.operators.text import tokens

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    got = [
        (r.merge_rank, r.left_sym, r.right_sym, r.pair_weight)
        for r in bpe_train(docs, tokens("text"), n_merges=4).collect()
    ]
    texts = [r.text for r in docs.select("text").collect()]
    assert got == _reference_bpe(texts, 4)


def test_bpe_greedy_fold_leftmost_nonoverlapping(spark):
    """'aaaa' + merge (a,a) must give [aa, aa], never [aa, a, a] or
    [a, aa, a] — the classic greedy-overlap trap."""
    from pygdf_spark.operators.bpe import char_syms, merge_pair

    df = spark.createDataFrame(
        [("aaaa",), ("aaa",), ("a",), ("baab",)], ["w"]
    ).withColumn("syms", char_syms("w"))
    out = {
        r.w: r.m
        for r in df.withColumn(
            "m", merge_pair("syms", F.lit("a"), F.lit("a"))
        ).collect()
    }
    assert out["aaaa"] == ["aa", "aa"]
    assert out["aaa"] == ["aa", "a"]
    assert out["a"] == ["a"]
    assert out["baab"] == ["b", "aa", "b"]


def test_bpe_merged_symbol_can_remerge(spark):
    """After (a,b)->ab, a later (ab,c) merge must see 'ab' as one
    symbol."""
    from pygdf_spark.operators.bpe import char_syms, merge_pair

    df = spark.createDataFrame([("abcabc",)], ["w"]).withColumn(
        "syms", char_syms("w")
    )
    df = df.withColumn("syms", merge_pair("syms", F.lit("a"), F.lit("b")))
    df = df.withColumn("syms", merge_pair("syms", F.lit("ab"), F.lit("c")))
    assert df.collect()[0].syms == ["abc", "abc"]


def test_bpe_lazy_plan_has_no_dup_hof(spark, sf_dir):
    from audit_plans import dup_hof_subtrees

    from pygdf_spark.operators.bpe import bpe_train
    from pygdf_spark.operators.text import tokens

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    out = bpe_train(docs, tokens("text"), n_merges=3, materialize=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert dup_hof_subtrees(plan) == 0, plan
    spark.catalog.clearCache()


def test_bpe_eager_path_unpersists_vocab(spark, sf_dir):
    from pygdf_spark.operators.bpe import bpe_train
    from pygdf_spark.operators.text import tokens

    spark.catalog.clearCache()
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    res = bpe_train(docs, tokens("text"), n_merges=2)
    assert res.count() == 2
    after = jsc.getPersistentRDDs().size()
    assert after <= before, f"persisted RDDs leaked: {before} -> {after}"


def test_bpe_train_property_random_corpora(spark):
    """Hypothesis sweep: bpe_train equals the scalar reference trainer
    on random tiny corpora (tie-breaks, single-char words, repeated
    merges over a 2-letter alphabet — the cases the fixture corpus
    never exercises)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pygdf_spark.operators.bpe import bpe_train
    from pygdf_spark.operators.text import tokens

    word = st.text(alphabet="ab", min_size=1, max_size=5)
    doc = st.lists(word, min_size=1, max_size=8).map(" ".join)

    @settings(max_examples=10, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(docs=st.lists(doc, min_size=1, max_size=6),
           n=st.integers(1, 3))
    def inner(docs, n):
        df = spark.createDataFrame([(t,) for t in docs], ["text"])
        got = [
            (r.merge_rank, r.left_sym, r.right_sym, r.pair_weight)
            for r in bpe_train(df, tokens("text"), n_merges=n).collect()
        ]
        assert got == _reference_bpe(docs, n)

    inner()


def test_unigram_viterbi_tie_breaks():
    """The DP's total order: higher score, then FEWER pieces, then
    lexicographically smallest path — pinned on hand-built vocabs."""
    from pygdf_spark.operators.unigram import _viterbi

    # 'abab': piece 'abab' (wgt 3) beats ab+ab (2+2=4)? no — 4 > 3, so
    # the two-piece path wins on SCORE first
    assert _viterbi("abab", {"a": 1, "b": 1, "ab": 2, "abab": 3}) == \
        ["ab", "ab"]
    # equal score: 'abab'(4) vs ab+ab (2+2): fewer pieces wins
    assert _viterbi("abab", {"a": 1, "b": 1, "ab": 2, "abab": 4}) == \
        ["abab"]
    # equal score AND length: lexicographically smallest path wins
    # 'aa': paths a+a (1+1) vs 'aa'(2): same score, 'aa' fewer pieces
    assert _viterbi("aa", {"a": 1, "aa": 2}) == ["aa"]
    # forced char fallback
    assert _viterbi("xyz", {"x": 1, "y": 1, "z": 1}) == ["x", "y", "z"]
    # lex tie: word 'ab', vocab {'a':1,'b':2,'ab':3} → 'ab' (3) ==
    # a+b (3) on score; fewer pieces → ['ab']
    assert _viterbi("ab", {"a": 1, "b": 2, "ab": 3}) == ["ab"]
    import pytest as _pt

    with _pt.raises(ValueError, match="unsegmentable"):
        _viterbi("aq", {"a": 1})


def test_unigram_segment_distributed_matches_scalar(spark, sf_dir):
    """The mapInPandas kernel agrees with the scalar DP on the real
    word relation, and every word reassembles from its pieces."""
    from pygdf_spark.operators.bpe import word_freq
    from pygdf_spark.operators.text import tokens
    from pygdf_spark.operators.unigram import (
        _viterbi, segment_words, unigram_vocab,
    )
    import os

    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    words = word_freq(d, tokens("text"))
    vocab = unigram_vocab(words)
    wgt = {r["piece"]: int(r["wgt"]) for r in vocab.collect()}
    seg = {r["w"]: r["pieces"]
           for r in segment_words(words, vocab).collect()}
    for w, pieces in seg.items():
        assert "".join(pieces) == w
        assert pieces == _viterbi(w, wgt)


# ----------------- bpe_train_fast: tokenizer-scale exact training -----


def test_bpe_fast_matches_sequential_trainer_at_256(spark):
    """The 1-job fast path must be bit-identical to sequential BPE at
    tokenizer-real merge counts (256), on a corpus rich enough that
    merges interact (shared letters, re-merged products)."""
    from pygdf_spark.operators.bpe import bpe_train_fast

    texts = [
        " ".join(
            f"w{(i * 7 + j) % 53:02d}x{(i + j * 3) % 11}" * ((j % 3) + 1)
            for j in range(12)
        )
        for i in range(200)
    ] + ["the quick brown fox jumps over the lazy dog"] * 40
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["pair_weight"])
        for r in bpe_train_fast(
            df, F.split(F.trim(F.col("text")), r"\s+"), 256
        ).collect()
    ]
    exp = _reference_bpe(texts, 256)
    assert got == exp
    assert len(got) > 100  # the corpus actually sustains deep merging


def test_bpe_fast_equals_distributed_trainer(spark, sf_dir):
    """fast(n=4) == bpe_train(n=4) on the real documents table."""
    from pygdf_spark.operators.bpe import bpe_train, bpe_train_fast

    from pygdf_spark.queries._util import T
    from pygdf_spark.queries.nlp import tokens

    d = T(spark, sf_dir, "documents")
    a = [tuple(r) for r in bpe_train(d, tokens("text"), 4).collect()]
    b = [tuple(r) for r in bpe_train_fast(d, tokens("text"), 4).collect()]
    assert a == b


def test_bpe_fast_is_one_job_regardless_of_merges(spark):
    """256 merges must cost exactly ONE Spark job (the r6 verdict's
    driver-latency wall: one job per merge at 30k merges)."""
    from pygdf_spark.operators.bpe import bpe_train_fast

    df = spark.createDataFrame(
        [("aa bb aa cc aa bb",)] * 50, "text string"
    )
    sc = spark.sparkContext
    sc.setJobGroup("bpe_fast_jobcount", "bpe fast job counting")
    try:
        bpe_train_fast(df, F.split(F.trim(F.col("text")), r"\s+"), 256)
    finally:
        sc.setJobGroup(None, None)
    st = sc.statusTracker()
    jobs = st.getJobIdsForGroup("bpe_fast_jobcount")
    # AQE may stage the vocab shuffle as 2 jobs; the point is the count
    # is CONSTANT in n_merges (sequential training = 1+ job per merge)
    assert len(jobs) <= 2, f"expected <=2 jobs, saw {len(jobs)}"


def test_bpe_fast_vocab_cap_is_deterministic(spark):
    """With a binding cap, the kept words are the top-(freq desc, w asc)
    prefix — deterministic truncation, documented pruning semantics."""
    from pygdf_spark.operators.bpe import bpe_train_fast

    texts = ["xx yy xx zz", "xx yy qq"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = bpe_train_fast(
        df, F.split(F.trim(F.col("text")), r"\s+"), 4, max_vocab_words=2
    ).collect()
    # top-2 words by (freq desc, w asc): xx(3), yy(2) -> merges within
    exp = _reference_bpe(["xx xx xx yy yy"], 4)
    assert [tuple(r) for r in got] == exp
