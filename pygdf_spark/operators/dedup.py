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

from pyspark.sql import DataFrame
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


def shingle_sets(
    docs: DataFrame, text_col: str = "text", n: int = 3,
    hashed: bool = False, p: int = MERSENNE_P,
) -> DataFrame:
    """(doc_id, sh: array<string>, n_sh[, xs: array<long>]) — the
    distinct shingle SET of each document as a map-side array. This is
    the scale-friendly representation: the set stays inside its row (no
    explode/distinct shuffle), and every downstream stage — hashing,
    signatures, pairwise intersection — becomes a codegen'd array
    expression. ``hashed=True`` additionally materializes the base hash
    of every shingle (one md5 per shingle, ever — permutation hashes
    downstream are integer folds over ``xs``)."""
    # Two-stage projection on purpose: aliasing the shingle array FIRST
    # and deriving n_sh/xs from the alias keeps exactly one evaluation
    # of the tokenize→ngram→distinct pipeline in the optimized plan.
    # Inlining `arr` into all three output columns re-evaluates it per
    # column (HOF trees are outside whole-stage codegen, so Catalyst
    # does not CSE them) — measured 3× slower at sf0.1.
    arr = F.array_distinct(ngrams(text_col, n))
    out = docs.select("doc_id", arr.alias("sh")).select(
        "doc_id", "sh", F.size("sh").alias("n_sh")
    )
    if hashed:
        out = out.withColumn("xs", F.transform("sh", lambda s: md5_mod(s, p)))
    return out


def minhash_signatures(
    docs_or_sets: DataFrame, num_perms: int = 6, p: int = MERSENNE_P,
    xs_p: int | None = None,
) -> DataFrame:
    """(doc_id, perm, minhash) long-form signatures, computed map-side:
    per-permutation minima are `array_min` folds over the in-row shingle
    set — no explode, no groupBy. The only post-scan movement is the
    final posexplode (num_perms rows per doc, for the LSH band join).

    Accepts the output of :func:`shingle_sets` (or raw docs)."""
    sets_df = (
        docs_or_sets if "sh" in docs_or_sets.columns else shingle_sets(docs_or_sets)
    )

    def perm_fn(i: int):
        return lambda v: minhash_perm(v, i, p)

    if "xs" in sets_df.columns:
        # precomputed base hashes carry their own modulus (shingle_sets'
        # default) — mixing moduli would silently produce signatures in
        # neither hash family
        if (xs_p or MERSENNE_P) != p:
            raise ValueError(
                f"minhash_signatures: precomputed xs uses modulus "
                f"{xs_p or MERSENNE_P} but p={p}; rehash the shingle sets "
                "with the matching p"
            )
        xs = F.col("xs")
    else:
        xs = F.transform(F.col("sh"), lambda s: md5_mod(s, p))
    sig = F.array(*[
        F.array_min(F.transform(xs, perm_fn(i))) for i in range(num_perms)
    ])
    return sets_df.select(
        "doc_id", F.posexplode(sig).alias("perm", "minhash")
    )


def lsh_candidate_pairs(signatures: DataFrame) -> DataFrame:
    """Band bucketing (band size 1) with STAR pairing: every doc in a
    (perm, minhash) bucket pairs with the bucket's MINIMUM doc_id, not
    with every other member. A clique self-join is quadratic in bucket
    size — an 8× duplication of a near-dup cluster costs 64× pairs and
    falls over exactly when dedup matters most (measured: 3.8s → 187s
    on an 8× corpus). The star is linear per bucket, and for dedup it
    is transitively complete: every cluster member connects to the
    cluster representative. Shuffle keys stay (perm, minhash) — short
    and uniform.

    The bucket minimum is a PARTIAL-AGGREGABLE groupBy merged back by
    an equi-join (opt r8, guide §2.5): the r7 shape computed it as
    min(doc_id) OVER (PARTITION BY perm, minhash), which put every
    member of a hot bucket — exactly the large near-dup cluster dedup
    exists for — into ONE window task with no map-side combine and no
    AQE help (skew splitting covers joins only). The groupBy side
    map-combines (a hot bucket contributes one row per map task), only
    buckets with ≥2 members survive to the join, and a skewed probe
    partition is AQE-splittable. Locally measured within noise of the
    window (1.28 vs 1.38 s min-of-5 interleaved at sf0.1); at scale
    the skew axis disappears. Same pairs bit-for-bit."""
    sig = signatures.select("doc_id", "perm", "minhash")
    bmin = (
        sig.groupBy("perm", "minhash")
        .agg(F.min("doc_id").alias("doc_a"), F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .drop("n")
    )
    return (
        sig.join(bmin, ["perm", "minhash"])
        .filter(F.col("doc_id") > F.col("doc_a"))
        .select("doc_a", F.col("doc_id").alias("doc_b"))
        .distinct()
    )


def jaccard_verify(sets_df: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs only: join each
    side's shingle ARRAY onto the (sparse) candidate list, intersect
    in-row. Two doc_id-keyed joins of the pair list — never a
    shingle-keyed self-join, whose output is quadratic in per-shingle
    document frequency and collapses under hot shingles at scale."""
    a = sets_df.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"),
                       F.col("n_sh").alias("na"))
    b = sets_df.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"),
                       F.col("n_sh").alias("nb"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                inter.cast("double") / (F.col("na") + F.col("nb") - inter),
                8,
            ).alias("jaccard"),
        )
    )


def minhash_lsh_dedup(
    docs: DataFrame, text_col: str = "text", num_perms: int = 6, threshold: float = 0.05
) -> DataFrame:
    """Full near-dup pipeline: shingle-sets → sign (map-side) →
    band-join → in-row verify.

    The set table is persisted: it feeds three plan branches (both band
    sides and the verify join) and would otherwise re-run the
    md5-per-shingle scan per branch. At 100 TB the same role is played
    by writing the shingle-set table to storage once and reusing it.

    The input is repartitioned to full cluster parallelism first: the
    shingle+hash map is CPU-bound, and its parallelism must come from an
    explicit exchange, not from the input split count (a handful of
    small parquet files would otherwise serialize the whole scan)."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    sets_df = shingle_sets(
        docs.repartition(par, "doc_id"), text_col, hashed=True
    ).persist()
    sig = minhash_signatures(sets_df, num_perms)
    pairs = lsh_candidate_pairs(sig)
    return jaccard_verify(sets_df, pairs).filter(F.col("jaccard") >= threshold)


def dedup_group_assignment(
    docs: DataFrame, text_col: str = "text", num_perms: int = 6
) -> DataFrame:
    """(doc_id, rep): the dedup KEEP-LIST — every document assigned to a
    group representative (the minimum doc_id over all its LSH buckets).
    ``rep == doc_id`` means "keep"; anything else is a near-dup of rep.

    One pass (no iterative connected components): docs sharing any band
    bucket with a smaller doc collapse onto that doc. Shuffles: the
    bucket groupBy + one doc_id groupBy — both on short uniform keys.
    This is the production shape for corpus-scale dedup, where the
    output is a keep-list, not the quadratic pair list."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    sets_df = shingle_sets(docs.repartition(par, "doc_id"), text_col, hashed=True)
    sig = minhash_signatures(sets_df, num_perms).persist()
    bmin = sig.groupBy("perm", "minhash").agg(F.min("doc_id").alias("bucket_rep"))
    assigned = (
        sig.join(bmin, ["perm", "minhash"])
        .groupBy("doc_id")
        .agg(F.min("bucket_rep").alias("rep"))
    )
    # docs too short to shingle have all-null signatures (array_min of
    # an empty set) and vanish from the non-null-safe bucket join — they
    # must self-represent, not disappear from the keep-list
    return (
        docs.select("doc_id")
        .join(assigned, "doc_id", "left")
        .select("doc_id", F.coalesce("rep", F.col("doc_id")).alias("rep"))
    )


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
    hashed = votes.select("doc_id", packed.alias("simhash"))
    # zero-token docs produce no vote rows and would vanish; they get
    # the zero-vote fingerprint (every tie-bit set = 2^bits - 1), the
    # same value the packing yields for an all-zero vote vector
    return (
        docs.select("doc_id")
        .join(hashed, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("simhash", F.lit((1 << bits) - 1)).alias("simhash"),
        )
    )


def substring_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    k: int = 6, carry: list[str] | None = None, hashed: bool = False,
) -> DataFrame:
    """Exact substring deduplication with SPAN REMOVAL (the Lee et al.
    2022 "Deduplicating Training Data Makes Language Models Better"
    semantic, re-expressed relationally): every k-token span that
    occurs more than once in the corpus keeps its GLOBAL FIRST
    occurrence (min (doc, position)) and every other occurrence's
    window is cut out of its document; the surviving tokens are
    rejoined into cleaned text.

    Spark-first plan — the suffix-array pass of the paper becomes one
    keyed shuffle on span identity:

    1. map-side: tokenize, emit (span, doc, pos) for every position
       (``posexplode`` over the in-row n-gram array — no UDF);
    2. one groupBy(span): first-occurrence ord = min(doc·10⁶ + pos),
       duplicated spans only (count ≥ 2);
    3. one equi-join back span→occurrences marks loser positions;
    4. per-doc mask: collect_set of marked starts (bounded by doc
       length), expanded in-row to covered positions, and a HOF filter
       drops covered tokens — no second shuffle over token rows.

    ``hashed=True`` is the 100 TB path: the span key becomes its
    xxhash64 (same plan, a fixed-8-byte shuffle key instead of the
    k-token string — ~10× narrower for k=6 prose). A 64-bit collision
    spuriously merges two distinct spans (deleting a non-duplicate
    window); at 10^10 spans the expected collision count is ~0.003 —
    the standard accepted trade (pytest pins hashed == exact on the
    fixtures). The string key stays the default because the DuckDB
    oracle mirrors it byte-for-byte.

    Returns one row per input document: ``id_col``, any ``carry``
    columns, ``n_tokens`` (pre), ``n_removed``, ``clean_text``.
    """
    carry = carry or []
    toks = docs.select(
        id_col, *carry, tokens(text_col).alias("__w")
    )
    # k-gram per start position, built from the token array directly
    # (slice/zip_with — the ngrams() fast shape, without re-tokenizing)
    m = F.greatest(F.size("__w") - (k - 1), F.lit(0))
    gexpr = F.slice("__w", 1, m)
    for jj in range(1, k):
        gexpr = F.zip_with(
            gexpr, F.slice("__w", jj + 1, m),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    # global-order key: doc·2³² + pos — positions are safe to 4.3B
    # tokens per doc, doc ids to 2³¹ (int64 headroom at both ends)
    grams = toks.select(
        id_col, F.posexplode(gexpr).alias("pos", "g")
    ).withColumn("ord", F.col(id_col) * 4_294_967_296 + F.col("pos"))
    if hashed:
        grams = grams.select(
            id_col, "pos", "ord", F.xxhash64("g").alias("g")
        )
    # duplicate-span losers via PARTIAL-AGG groupBy(g) + join-back
    # (opt r8, guide §2.5): the r7 window shape — min(ord)/count(*)
    # OVER (PARTITION BY g) — shuffled the FULL occurrence stream by g
    # and put every occurrence of a hot span (boilerplate sentences:
    # the corpus-dedup hot case) into ONE window task, with no
    # map-side combine and no AQE help (skew splitting covers joins
    # only). Here the aggregate side map-combines (a hot g yields one
    # row per map task before the exchange), only spans with n ≥ 2
    # survive to the join — the sparse duplicated subset — and a
    # skewed probe partition is AQE-splittable. The price is a second
    # evaluation of the map-side gram pipeline (the agg branch);
    # measured +0.15-0.2 s on a ~1.5 s noisy-band row at sf0.1
    # (interleaved min-of-5: window 1.53 / join 1.77 / join+persist
    # 1.84 — persisting the gram stream costs more than the re-eval,
    # and is not a 100 TB option anyway), bought back many times over
    # at scale by never shuffling the occurrence stream. Same winners,
    # same marks, bit-identical rows (pytest + oracle pin it).
    dups = (
        grams.groupBy("g")
        .agg(F.min("ord").alias("first_ord"), F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
    )
    marks = (
        grams.join(dups, "g")
        .filter(F.col("ord") != F.col("first_ord"))
        .select(id_col, "pos")
    )
    masks = marks.groupBy(id_col).agg(
        F.collect_set("pos").alias("__starts")
    )
    j = toks.join(masks, id_col, "left").withColumn(
        "__cov",
        F.array_distinct(
            F.flatten(
                F.transform(
                    F.coalesce("__starts", F.array().cast("array<int>")),
                    lambda s: F.sequence(s, s + (k - 1)),
                )
            )
        ),
    )
    # stage the filter HOF behind an alias: interpreted HOF subtrees are
    # not CSE'd, so inlining it into both size() and concat_ws() would
    # run the mask filter twice per row (CollapseProject keeps the
    # two-step shape because the alias is referenced more than once)
    cleaned = F.filter(
        "__w", lambda x, i: ~F.array_contains(F.col("__cov"), i)
    )
    staged = j.select(id_col, *carry, "__w", cleaned.alias("__c"))
    return staged.select(
        id_col,
        *carry,
        F.size("__w").alias("n_tokens"),
        (F.size("__w") - F.size("__c")).alias("n_removed"),
        F.concat_ws(" ", "__c").alias("clean_text"),
    )


def fuzzy_join(
    left: DataFrame, right: DataFrame, on: str, block,
    max_dist: int = 2, suffixes: tuple = ("_l", "_r"),
) -> DataFrame:
    """Approximate string join (entity resolution / near-dup titles):
    candidate pairs come from EQUALITY on a blocking key expression
    (a Column function of the string — suffix, phonetic code, length
    band, q-gram bucket...), then exact Levenshtein verifies
    ``dist <= max_dist``. The blocking key turns the O(n·m) all-pairs
    edit-distance into one equi-join whose cost is Σ|bucket_l|·|bucket_r|
    — the standard record-linkage shape; correctness of RECALL depends
    on the key being invariant under the expected corruption (callers
    pick it; the join itself never misses a pair the key co-buckets).

    Returns left/right columns suffixed plus ``dist``."""
    lcols = [F.col(c).alias(c + suffixes[0]) for c in left.columns]
    rcols = [F.col(c).alias(c + suffixes[1]) for c in right.columns]
    lb = left.select(*lcols, block(F.col(on)).alias("__bk"))
    rb = right.select(*rcols, block(F.col(on)).alias("__bk"))
    ln, rn = on + suffixes[0], on + suffixes[1]
    return (
        lb.join(rb, "__bk")
        .withColumn("dist", F.levenshtein(F.col(ln), F.col(rn)))
        .filter(F.col("dist") <= max_dist)
        .drop("__bk")
    )
