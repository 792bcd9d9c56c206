"""Deduplication operators for LLM-data pipelines: exact, MinHash+LSH,
SimHash, n-gram Jaccard (north-star extensions; seeds in SURVEY.md
§2.9-text — drop_duplicates parity is stream_compaction.hpp:238).

Scale design (100 TB posture):
- every stage is explode → hash → groupBy, i.e. map-side work plus one
  keyed shuffle per stage; no driver-side loops, no collect().
- candidate generation is band-bucket join (shuffle on short band
  keys), NOT an O(n²) cross join; the pairwise verify only runs inside
  buckets. This is the standard MinHash-LSH plan shape that holds at
  1000 executors.
- the hash is pluggable: md5-derived (oracle-mirrorable, used in
  tests) or xxhash64 (production; functions/hashing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pygdf_spark.functions.hashing import MERSENNE_P, md5_mod, minhash_perm
from pygdf_spark.operators.text import doc_fingerprint, ngrams, tokens


def exact_dedup_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup by normalized fingerprint (hash-groupBy): one keyed
    shuffle, map-side partial agg."""
    fp = doc_fingerprint(text_col)
    return docs.select(fp.alias("fp"), "doc_id").groupBy("fp").agg(
        F.count(F.lit(1)).alias("n_copies"), F.min("doc_id").alias("keep_doc")
    )


def shingles(docs: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """(doc_id, shingle) distinct word n-gram shingles."""
    return (
        docs.select("doc_id", F.explode(ngrams(text_col, n)).alias("shingle"))
        .distinct()
    )


def minhash_signatures(
    sh: DataFrame, num_perms: int = 6, p: int = MERSENNE_P
) -> DataFrame:
    """(doc_id, perm, minhash): base-hash each shingle once, then take
    per-permutation minima — one groupBy(doc_id, perm) shuffle."""
    hashed = sh.select("doc_id", md5_mod("shingle", p).alias("x"))
    perms = hashed.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("perm"), minhash_perm(F.col("x"), i, p).alias("h"))
                for i in range(num_perms)
            ])
        ).alias("ph"),
    ).select("doc_id", F.col("ph.perm").alias("perm"), F.col("ph.h").alias("h"))
    return perms.groupBy("doc_id", "perm").agg(F.min("h").alias("minhash"))


def lsh_candidate_pairs(signatures: DataFrame) -> DataFrame:
    """Band join (band size 1): docs sharing any per-perm minhash become
    candidates. Shuffle key is (perm, minhash) — short and uniform."""
    a = signatures.select(F.col("doc_id").alias("doc_a"), "perm", "minhash")
    b = signatures.select(F.col("doc_id").alias("doc_b"), "perm", "minhash")
    return (
        a.join(b, ["perm", "minhash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def jaccard_verify(sh: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs only."""
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    shared = (
        sh.select(F.col("doc_id").alias("doc_a"), "shingle")
        .join(sh.select(F.col("doc_id").alias("doc_b"), "shingle"), "shingle")
        .join(pairs, ["doc_a", "doc_b"])  # semi-restrict to candidates
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        shared.join(sizes.withColumnsRenamed({"doc_id": "doc_a", "n_sh": "na"}), "doc_a")
        .join(sizes.withColumnsRenamed({"doc_id": "doc_b", "n_sh": "nb"}), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter")),
                8,
            ).alias("jaccard"),
        )
    )


def minhash_lsh_dedup(
    docs: DataFrame, text_col: str = "text", num_perms: int = 6, threshold: float = 0.05
) -> DataFrame:
    """Full near-dup pipeline: shingle → sign → band-join → verify."""
    sh = shingles(docs, text_col)
    sig = minhash_signatures(sh, num_perms)
    pairs = lsh_candidate_pairs(sig)
    return jaccard_verify(sh, pairs).filter(F.col("jaccard") >= threshold)


def simhash16(docs: DataFrame, text_col: str = "text", bits: int = 16) -> DataFrame:
    """SimHash over whitespace tokens (with multiplicity): per-bit
    signed vote, sign → bit, packed little-endian. One groupBy(doc_id)
    shuffle; at scale the token explode is map-local."""
    toks = docs.select("doc_id", F.explode(tokens(text_col)).alias("tok"))
    x = md5_mod("tok", 1 << bits)
    votes = toks.select("doc_id", x.alias("x")).groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(((F.col("x") / (1 << j)).cast("long") % 2) == 1, 1).otherwise(-1)
            ).alias(f"v{j}")
            for j in range(bits)
        ]
    )
    packed = sum(
        F.when(F.col(f"v{j}") >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        for j in range(bits)
    )
    return votes.select("doc_id", packed.alias("simhash"))
