"""Materialize WordPiece expectations for the nlp_subword_tokenize oracle.

The greedy longest-match WordPiece loop is genuinely iterative, so no
ANSI-SQL oracle can express it — this was the registry's only permanent
``err:no_oracle`` row. Instead we precompute the expected encodings with
an INDEPENDENT reference encoder (re-derived below from the published
WordPiece algorithm — Wu et al. 2016 / BERT's tokenizer spec — not
imported from the engine; only the vocab ARTIFACT ``demo_vocab`` is
shared, the way a trained vocab file would be) and store them as a
parquet fixture keyed by ``md5(text)``. The DuckDB oracle then becomes a
plain equi-join of ``documents`` against the fixture, and the driver's
row/schema/hash compare applies in full.

Keying by text hash (not doc_id) makes ONE fixture valid at every scale
factor: sf1 replicates sf0.1 texts with shifted ids (tools/make_sf1.py),
and the sf0.001/0.01/0.1 corpora are unioned here.

Usage: python tools/make_subword_fixture.py [out_parquet]
       (default pygdf_spark/fixtures/subword_expected.parquet)

Reference parity target: nvtext/subword_tokenize.hpp:62,
python/cudf/cudf/core/subword_tokenizer.py.
"""

from __future__ import annotations

import glob
import hashlib
import os
import re
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pygdf_spark.operators.subword import demo_vocab  # vocab artifact only

MAX_LEN = 32          # the query's max_len (queries/nlp.py)
IDS_HEAD = 12         # the query projects the first 12 ids
_WORD_RE = re.compile(r"[a-z0-9]+|[^a-z0-9\s]")


def _encode_word(word: str, vocab: dict[str, int]) -> list[int]:
    """Canonical WordPiece per-word loop: longest matching prefix,
    continuations prefixed '##', whole word -> [UNK] on any miss;
    words over 100 chars -> [UNK] (max_input_chars_per_word)."""
    if len(word) > 100:
        return [vocab["[UNK]"]]
    pieces: list[int] = []
    start = 0
    while start < len(word):
        for end in range(len(word), start, -1):
            piece = ("##" if start else "") + word[start:end]
            if piece in vocab:
                pieces.append(vocab[piece])
                start = end
                break
        else:
            return [vocab["[UNK]"]]
    return pieces


def reference_encode(text: str, vocab: dict[str, int], max_len: int) -> list[int]:
    """[CLS] <pieces...> [SEP], truncated to max_len, padded with [PAD].
    Truncation checks at WORD boundaries (a word's pieces may overrun,
    then the tail is trimmed before [SEP]) — BERT framing convention."""
    ids = [vocab["[CLS]"]]
    for w in _WORD_RE.findall((text or "").lower()):
        if len(ids) >= max_len - 1:
            break
        ids.extend(_encode_word(w, vocab))
    ids = ids[: max_len - 1] + [vocab["[SEP]"]]
    return ids + [vocab["[PAD]"]] * (max_len - len(ids))


def main(out: str = "pygdf_spark/fixtures/subword_expected.parquet") -> None:
    vocab = {t: i for i, t in enumerate(demo_vocab())}
    rows: dict[str, tuple] = {}
    srcs = sorted(glob.glob("/root/testdata/sf*/documents.parquet"))
    assert srcs, "no documents.parquet found under /root/testdata"
    for src in srcs:
        df = pd.read_parquet(src, columns=["doc_id", "text"])
        df = df[df["doc_id"] < 300]
        for text in df["text"]:
            t = text if isinstance(text, str) else ""
            key = hashlib.md5(t.encode("utf-8")).hexdigest()
            if key in rows:
                continue
            ids = reference_encode(t, vocab, MAX_LEN)
            rows[key] = (
                key,
                sum(1 for i in ids if i != 0),
                ",".join(str(i) for i in ids[:IDS_HEAD]),
                1 if ids[0] != 0 else 0,
            )
    fx = pd.DataFrame(
        sorted(rows.values()),
        columns=["text_md5", "n_tokens", "ids_head", "mask_first"],
    ).astype({"n_tokens": "int32", "mask_first": "int32"})
    os.makedirs(os.path.dirname(out), exist_ok=True)
    fx.to_parquet(out, index=False)
    print(f"{len(fx)} distinct texts -> {out}")


if __name__ == "__main__":
    main(*sys.argv[1:])
