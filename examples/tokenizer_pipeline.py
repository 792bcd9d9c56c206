"""Tokenizer pipeline walkthrough: train BPE merges on the corpus,
encode documents with them, then budget-pack the encoded lengths.

Run: python examples/tokenizer_pipeline.py [sf_dir]

The full loop a pretraining data stack runs BEFORE the data loader:

  corpus ──► word-freq relation ──► BPE merge training   (one shuffle,
                                     then vocab-sized iterations)
         ──► per-word subword lengths ──► per-doc token counts
         ──► token-budget sequence packing

Every stage is a declarative Spark plan; the vocab relation — not the
corpus — is what the training iterations touch, which is why the loop
is flat in corpus size (SCALING.md: 1× → 8× data, 10.8 s → 10.7 s).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pygdf_spark import get_spark
from pygdf_spark.operators.bpe import bpe_subword_lengths, bpe_train
from pygdf_spark.operators.packing import with_pack_ids
from pygdf_spark.operators.text import tokens
from pygdf_spark.queries._util import T


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("tokenizer-pipeline")
    docs = T(spark, sf_dir, "documents")

    # 1. train — the merge table is the artifact a tokenizer loads
    merges = bpe_train(docs, tokens("text"), n_merges=4)
    print("learned merges:")
    for r in merges.collect():
        print(f"  #{r.merge_rank}: {r.left_sym!r} + {r.right_sym!r}"
              f"  (pair weight {r.pair_weight})")

    # 2. encode — per-doc subword counts under those merges
    cached, lengths = bpe_subword_lengths(docs, tokens("text"), n_merges=4)
    words = docs.select("doc_id", F.explode(tokens("text")).alias("w"))
    enc = (
        words.join(F.broadcast(lengths), "w")
        .groupBy("doc_id")
        .agg(F.sum("n_syms").alias("n_tok"))
    )
    stats = enc.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.avg("n_tok").alias("avg_tokens"),
    ).collect()[0]
    print(f"\nencoded {stats.docs} docs -> {stats.total_tokens} subword "
          f"tokens (avg {stats.avg_tokens:.1f}/doc)")

    # 3. pack — token-budget sequence packing over the encoded lengths
    packed = with_pack_ids(
        enc.select("doc_id", "n_tok"), budget=512, n_shards=4,
    )
    n_packs = packed.select("shard", "pack_id").distinct().count()
    print(f"packed into {n_packs} sequences at budget 512")

    cached.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
