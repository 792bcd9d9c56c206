"""Unigram (SentencePiece-style) subword segmentation, distributed.

Completes the tokenizer family: WordPiece APPLY (operators/subword.py),
BPE TRAIN+ENCODE (operators/bpe.py), and now unigram-LM SEGMENTATION —
the Viterbi decode at the heart of SentencePiece (Kudo 2018): segment
each word into the vocabulary pieces maximizing the product of piece
scores.

Determinism discipline (what makes this DuckDB-oracle-checkable): piece
scores are INTEGER-QUANTIZED log2 counts — ``length(bin(count)) - 1``,
exact in both engines — so Viterbi maximizes an integer SUM, never a
float product; ties break by (fewer pieces, lexicographically smallest
piece sequence), a total order both engines express identically. The
left-to-right DP is valid under this tie-break because the optimal
suffix from a position is unique, so comparing full paths reduces to
comparing prefix tuples.

Scale shape: the corpus collapses to the (word, freq) relation with ONE
shuffle (operators/bpe.word_freq — natural-language vocabulary grows
sublinearly, Heaps' law); candidate pieces are an in-row substring
explode + one keyed aggregate; the vocabulary is a driver-bounded top-k
(TakeOrderedAndProject) broadcast into an Arrow-batched Viterbi kernel
over the word relation. Nothing rescans the corpus.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def candidate_pieces(
    words: DataFrame, max_piece_len: int = 4
) -> DataFrame:
    """All substrings (length 1..L) of every word, weighted by word
    frequency — the unigram seed-vocabulary relation. In-row explode,
    one keyed aggregate; no corpus re-scan."""
    subs = F.expr(
        f"""flatten(transform(sequence(1, length(w)), i ->
             transform(sequence(1, least({int(max_piece_len)},
                                         length(w) - i + 1)),
                       l -> substring(w, i, l))))"""
    )
    return (
        words.select(F.explode(subs).alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
    )


def unigram_vocab(
    words: DataFrame, max_piece_len: int = 4, top_k: int = 60
) -> DataFrame:
    """Vocabulary = top_k candidates by (count desc, piece asc) UNION
    every single character (the closure guarantee: any word remains
    segmentable). Scores are integer log2 quantized: wgt =
    length(bin(cnt)) - 1 (exact in Spark's bin() and DuckDB's bin())."""
    cand = candidate_pieces(words, max_piece_len)
    top = cand.orderBy(F.desc("cnt"), F.asc("piece")).limit(top_k)
    chars = cand.filter(F.length("piece") == 1)
    vocab = (
        top.unionByName(chars)
        .groupBy("piece")
        .agg(F.max("cnt").alias("cnt"))
    )
    return vocab.select(
        "piece", "cnt", (F.length(F.bin("cnt")) - 1).cast("int").alias("wgt")
    )


def _viterbi(word: str, wgt: dict) -> list[str]:
    """Best segmentation by (max Σwgt, min pieces, lex-smallest path).
    best[p] = winning (score, -npieces... ) tuple at prefix length p;
    stored as (score, n_pieces, path) compared via the custom order."""
    n = len(word)
    best: list[tuple | None] = [None] * (n + 1)
    best[0] = (0, 0, [])
    max_len = max((len(p) for p in wgt), default=1)
    for p in range(1, n + 1):
        for l in range(1, min(max_len, p) + 1):
            piece = word[p - l: p]
            if piece not in wgt or best[p - l] is None:
                continue
            s0, k0, path0 = best[p - l]
            cand = (s0 + wgt[piece], k0 + 1, path0 + [piece])
            cur = best[p]
            if cur is None or (-cand[0], cand[1], cand[2]) < (
                -cur[0], cur[1], cur[2]
            ):
                best[p] = cand
    if best[n] is None:  # unreachable with char closure; loud anyway
        raise ValueError(f"unigram: unsegmentable word {word!r}")
    return best[n][2]


def segment_words(words: DataFrame, vocab: DataFrame) -> DataFrame:
    """Viterbi-segment the (w, freq) relation against the vocabulary:
    returns (w, freq, pieces array<string>). The vocabulary is a
    bounded top-k — collected once (driver-bounded by construction) and
    broadcast inside the Arrow-batched kernel."""
    wgt = {r["piece"]: int(r["wgt"]) for r in vocab.collect()}  # bounded

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "w": pdf["w"],
                "freq": pdf["freq"],
                "pieces": [_viterbi(w, wgt) for w in pdf["w"]],
            })

    return words.mapInPandas(
        kernel, "w string, freq long, pieces array<string>"
    )


def piece_usage(segmented: DataFrame) -> DataFrame:
    """Corpus-level piece usage: explode segmentations weighted by word
    frequency — the statistic an LM tokenizer's coverage report needs."""
    return (
        segmented.select(F.explode("pieces").alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").alias("n_uses"))
    )
