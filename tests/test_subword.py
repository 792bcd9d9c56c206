"""WordPiece subword_tokenize parity (nvtext/subword_tokenize.hpp:62,
core/subword_tokenizer.py): the greedy longest-match algorithm is pinned
against hand-computed encodings (the canonical "unaffable" example
family), then the Spark operator is checked to match the pure-Python
encoder on the documents fixture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pygdf_spark.operators.subword import (
    SPECIALS,
    demo_vocab,
    subword_tokenize,
    wordpiece_encode,
)

VOCAB = SPECIALS + ["un", "##aff", "##able", "aff", "##ord", "runn", "##ing", "the"]
VTAB = {t: i for i, t in enumerate(VOCAB)}


def enc(text, max_len=10):
    return wordpiece_encode(text, VTAB, max_len)


def test_wordpiece_classic_example():
    # "unaffable" -> un ##aff ##able  (the canonical WordPiece case)
    ids = enc("unaffable")
    assert ids[:5] == [VTAB["[CLS]"], VTAB["un"], VTAB["##aff"], VTAB["##able"], VTAB["[SEP]"]]
    assert ids[5:] == [0] * 5  # PAD


def test_wordpiece_whole_word_and_unk():
    assert enc("the")[:3] == [VTAB["[CLS]"], VTAB["the"], VTAB["[SEP]"]]
    # no piece covers "xyz" -> single [UNK]
    assert enc("xyz")[:3] == [VTAB["[CLS]"], VTAB["[UNK]"], VTAB["[SEP]"]]
    # greedy: "afford" -> aff ##ord ; "running" -> runn ##ing
    assert enc("afford running")[:6] == [
        VTAB["[CLS]"], VTAB["aff"], VTAB["##ord"], VTAB["runn"], VTAB["##ing"], VTAB["[SEP]"],
    ]


def test_wordpiece_truncation_and_padding():
    ids = enc("the the the the the the the the the the", max_len=6)
    assert len(ids) == 6
    assert ids[0] == VTAB["[CLS]"] and ids[5] == VTAB["[SEP]"]
    assert ids[1:5] == [VTAB["the"]] * 4  # truncated, no PAD needed


def test_demo_vocab_never_unks_ascii():
    v = {t: i for i, t in enumerate(demo_vocab())}
    assert v["[UNK]"] not in wordpiece_encode("zygomorphic q7 words", v, 32)


@pytest.mark.parametrize("max_len", [16, 32])
def test_spark_matches_python_encoder(spark, sf_dir, max_len):
    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") < 50)
        .select("doc_id", "text")
    )
    out = subword_tokenize(d, "text", max_len=max_len).orderBy("doc_id").collect()
    vtab = {t: i for i, t in enumerate(demo_vocab())}
    texts = {r["doc_id"]: r["text"] for r in d.collect()}
    assert len(out) == 50
    for r in out:
        expect = wordpiece_encode(texts[r["doc_id"]] or "", vtab, max_len)
        assert r["input_ids"] == expect
        assert r["attention_mask"] == [1 if i != 0 else 0 for i in expect]
        assert r["n_tokens"] == sum(1 for i in expect if i != 0)


def test_wordpiece_long_word_emits_unk():
    """canonical max_input_chars_per_word=100: a >100-char run emits
    [UNK] instead of an O(L^3) greedy loop (r4 review)."""
    import time

    from pygdf_spark.operators.subword import demo_vocab, wordpiece_encode

    vocab = {tok: i for i, tok in enumerate(demo_vocab())}
    blob = "a" * 50_000
    t0 = time.perf_counter()
    ids = wordpiece_encode(f"the {blob} ing", vocab, 16)
    assert time.perf_counter() - t0 < 1.0  # would be hours without the cap
    assert ids[1] == vocab["the"]
    assert ids[2] == vocab["[UNK]"]
    # boundary: exactly 100 chars still tokenizes normally
    ids100 = wordpiece_encode("a" * 100, vocab, 128)
    assert vocab["[UNK]"] not in ids100
