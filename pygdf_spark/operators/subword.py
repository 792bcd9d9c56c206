"""WordPiece subword tokenization (nvtext subword_tokenize parity).

Reference: ``cpp/include/nvtext/subword_tokenize.hpp:62`` and
``python/cudf/cudf/core/subword_tokenizer.py`` (BERT-style WordPiece:
[CLS]/[SEP] framing, max_length truncation, padded ``input_ids`` +
``attention_mask`` tensors). The reference hashes its vocab to the GPU
(``utils/hash_vocab_utils.py``); Spark-side we keep the vocab as a plain
``dict`` shipped once per executor inside the Arrow-batched pandas UDF
closure — at cluster scale this is a broadcast-sized artifact (BERT-base
vocab ≈ 30k strings ≈ 1 MB), far below any shuffle concern, and the
tokenization itself is a narrow per-partition map with no shuffle.

The greedy longest-match-first algorithm is the canonical WordPiece:
whole word if in vocab, else repeatedly take the longest matching prefix
(continuations prefixed ``##``); any unmatched word becomes [UNK].
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

#: canonical special tokens, ids 0..3 (BERT convention: PAD=0)
SPECIALS = ["[PAD]", "[UNK]", "[CLS]", "[SEP]"]

_PRE_SPLIT = re.compile(r"[a-z0-9]+|[^a-z0-9\s]")


def demo_vocab() -> list[str]:
    """Deterministic demonstration vocab: specials, whole-word common
    English subwords, then a..z / 0..9 as both word-initial and ``##``
    continuation pieces — guarantees every ASCII word tokenizes without
    [UNK], like a real trained vocab would."""
    chars = [chr(c) for c in range(ord("a"), ord("z") + 1)] + [str(d) for d in range(10)]
    words = [
        "the", "and", "ing", "ion", "er", "re", "in", "on", "at", "or",
        "un", "##ing", "##ion", "##er", "##ed", "##ly", "##s", "##es",
    ]
    return SPECIALS + words + chars + ["##" + c for c in chars]


#: canonical WordPiece word-length cap (HF/cudf max_input_chars_per_word):
#: longer words emit [UNK] — and without the cap the greedy suffix loop
#: is O(L^2)-O(L^3) Python work per word, so one long base64/hash blob
#: in a document would pin an executor core
_MAX_WORD_CHARS = 100


def wordpiece_encode(text: str, vocab: dict[str, int], max_len: int) -> list[int]:
    """Greedy longest-match WordPiece over lower-cased pre-split words,
    framed [CLS] ... [SEP], truncated to max_len, padded with [PAD]=0.
    Words over _MAX_WORD_CHARS chars emit [UNK] (canonical WordPiece
    max_input_chars_per_word=100)."""
    cls_id, sep_id, unk_id, pad_id = vocab["[CLS]"], vocab["[SEP]"], vocab["[UNK]"], vocab["[PAD]"]
    ids = [cls_id]
    for word in _PRE_SPLIT.findall(text.lower()):
        if len(ids) >= max_len - 1:
            break
        if len(word) > _MAX_WORD_CHARS:
            ids.append(unk_id)
            continue
        piece_ids: list[int] = []
        start = 0
        while start < len(word):
            end = len(word)
            hit = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in vocab:
                    hit = vocab[sub]
                    break
                end -= 1
            if hit is None:
                piece_ids = [unk_id]
                break
            piece_ids.append(hit)
            start = end
        ids.extend(piece_ids)
    ids = ids[: max_len - 1] + [sep_id]
    return ids + [pad_id] * (max_len - len(ids))


def subword_tokenize(
    df: DataFrame,
    text_col: str = "text",
    vocab: list[str] | None = None,
    max_len: int = 32,
) -> DataFrame:
    """subword_tokenize (subword_tokenize.hpp:62): adds ``input_ids``,
    ``attention_mask`` (both length ``max_len``) and ``n_tokens``.

    Ids come from one Arrow-batched pandas UDF (the genuinely iterative
    greedy match); mask and count are derived JVM-side from the ids so
    only one Python crossing happens per batch.
    """
    vocab_list = vocab if vocab is not None else demo_vocab()
    vtab = {tok: i for i, tok in enumerate(vocab_list)}
    pad_id = vtab["[PAD]"]

    @pandas_udf("array<int>")
    def _ids(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: wordpiece_encode(t or "", vtab, max_len))

    out = df.withColumn("input_ids", _ids(F.col(text_col)))
    mask = F.transform("input_ids", lambda t: (t != pad_id).cast("int"))
    return out.withColumn("attention_mask", mask).withColumn(
        "n_tokens", F.aggregate("attention_mask", F.lit(0), lambda a, x: a + x)
    )
