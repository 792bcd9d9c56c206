"""Distributed BPE (byte-pair-encoding) merge training.

The reference ecosystem CONSUMES a trained subword vocabulary
(cudf subword_tokenize, python/cudf/cudf/core/tokenize_vocabulary.py;
nvtext/subword_tokenize.hpp:62) — training that vocabulary is the
upstream pipeline step a 100 TB curation stack has to run itself.
This is the Sennrich-style formulation that actually scales:

- ONE corpus-wide shuffle builds the ``(word, freq)`` relation;
- every merge iteration after that runs on the VOCABULARY relation
  (|V| rows, ≪ corpus at any scale — the corpus is never re-scanned);
- the per-iteration argmax is a vocabulary-pair aggregate (partial
  map-side combine, one tiny shuffle) and the winning pair reaches the
  merge step as a broadcast 1-row join — there is NO driver loop over
  rows and no collect anywhere in the lazy path.

The greedy leftmost merge is an in-row ``F.aggregate`` fold (HOF —
interpreted, but it runs over the vocab relation only). At 100 TB the
vocab relation is millions of rows, still thousands of times smaller
than the corpus; this shape is exactly how production BPE trainers
distribute.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def char_syms(col) -> Column:
    """Initial symbol sequence of a word: one single-character symbol
    per char (``substring`` transform — locale-independent, and the
    exact mirror of the oracle's ``list_transform(generate_series...)``
    so both engines agree on every code unit)."""
    c = F.col(col) if isinstance(col, str) else col
    chars = F.transform(
        F.sequence(F.lit(1), F.length(c)),
        lambda i: c.substr(i, F.lit(1)),
    )
    # sequence(1, 0) counts DOWN ([1, 0]) — guard the empty string
    return F.when(F.length(c) > 0, chars).otherwise(
        F.array().cast("array<string>")
    )


def adjacent_pairs(syms_col: str) -> Column:
    """Adjacent symbol pairs of ``syms`` as ``struct<a,b>`` —
    ``slice``-based so single-symbol words yield an EMPTY array
    (``F.sequence(1, 0)`` would count DOWN [1,0] and fabricate a pair,
    so it is deliberately avoided)."""
    return F.expr(
        f"transform(slice({syms_col}, 2, greatest(size({syms_col}) - 1, 0)),"
        f" (s, i) -> struct({syms_col}[i] as a, s as b))"
    )


def merge_pair(syms_col: str, a: Column, b: Column) -> Column:
    """Greedy leftmost non-overlapping merge of adjacent pair (a, b)
    into the single symbol ``a || b`` — one in-row fold, the BPE apply
    step. ``element_at(acc, -1)`` on the empty accumulator is null in
    non-ANSI mode, so the first symbol always appends."""
    return F.aggregate(
        F.col(syms_col),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (x == b) & (F.element_at(acc, -1) == a),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(a, b)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def word_freq(docs: DataFrame, tokens: Column) -> DataFrame:
    """The one corpus-wide shuffle: ``(w, freq)`` vocabulary relation."""
    return (
        docs.select(F.explode(tokens).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _train_chain(docs: DataFrame, tokens: Column, n_merges: int):
    """Build the lazy training graph. Returns ``(cached, final_vocab,
    bests)``: the persisted base vocab (caller must unpersist after
    materializing), the vocab relation with ALL ``n_merges`` merges
    applied, and the per-iteration 1-row argmax frames.

    The vocab relation is persisted once: it feeds every iteration's
    pair count AND the merge chain — without the cache boundary the
    corpus shuffle re-runs per branch, ~2^n_merges times."""
    vocab = word_freq(docs, tokens).withColumn(
        "syms", char_syms("w")
    ).select("w", "freq", "syms")
    cached = vocab.persist()

    cur = cached
    bests = []
    for i in range(1, n_merges + 1):
        pc = (
            cur.select(F.explode(adjacent_pairs("syms")).alias("p"), "freq")
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("cnt"))
        )
        best = pc.orderBy(
            F.desc("cnt"), F.asc("a"), F.asc("b")
        ).limit(1).select(
            F.lit(i).alias("merge_rank"),
            F.col("a").alias("left_sym"),
            F.col("b").alias("right_sym"),
            F.col("cnt").alias("pair_weight"),
        )
        bests.append(best)
        cur = (
            cur.crossJoin(F.broadcast(
                best.select(F.col("left_sym").alias(f"_ma{i}"),
                            F.col("right_sym").alias(f"_mb{i}"))
            ))
            .withColumn(
                "syms",
                merge_pair("syms", F.col(f"_ma{i}"), F.col(f"_mb{i}")),
            )
            .select("w", "freq", "syms")
        )

    return cached, cur, bests


def bpe_train(docs: DataFrame, tokens: Column, n_merges: int = 4,
              materialize: bool = True) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges over a corpus.

    Returns the merge table ``(merge_rank, left_sym, right_sym,
    pair_weight)`` — the trained artifact a tokenizer loads. Ties on
    pair weight break lexicographically (left asc, right asc) so the
    result is deterministic on any partitioning.

    With ``materialize`` the ≤``n_merges``-row result is collected and
    the vocab cache released (the IVF-probe leak lesson, ADVICE r5);
    ``materialize=False`` returns the lazy plan for plan-audit tooling
    and leaves the persist to the caller.

    Optimization (r7, guide §1.2/§5): the materialized path runs the
    iteration EAGERLY — each round collects its 1-row argmax (bounded:
    n_merges rows total, the same collect the lazy path paid at the
    end) and applies the winning pair as LITERALS, checkpointing the
    vocab relation between rounds. The previous fully-lazy union
    replayed round i's argmax subtree inside every later round's
    broadcast chain (O(n²) pair-count jobs) and stacked i interpreted
    merge folds per row; eager rounds run exactly one pair aggregate +
    one vocab materialization each, with a single fold per round
    (measured 3.19s → see OPTIMIZATION_r07.md). Identical output rows:
    same tie-break, same greedy-leftmost fold, same schema.
    """
    if not materialize:
        cached, _, bests = _train_chain(docs, tokens, n_merges)
        out = bests[0]
        for b in bests[1:]:
            out = out.unionByName(b)
        return out.orderBy("merge_rank")

    vocab = word_freq(docs, tokens).withColumn(
        "syms", char_syms("w")
    ).select("w", "freq", "syms")
    cur = vocab.persist()
    persisted = [cur]
    schema = None
    out_rows = []
    try:
        for i in range(1, n_merges + 1):
            pc = (
                cur.select(
                    F.explode(adjacent_pairs("syms")).alias("p"), "freq"
                )
                .groupBy("p.a", "p.b")
                .agg(F.sum("freq").alias("cnt"))
            )
            best = pc.orderBy(
                F.desc("cnt"), F.asc("a"), F.asc("b")
            ).limit(1).select(
                F.lit(i).alias("merge_rank"),
                F.col("a").alias("left_sym"),
                F.col("b").alias("right_sym"),
                F.col("cnt").alias("pair_weight"),
            )
            if schema is None:
                schema = best.schema
            top = best.collect()  # bounded: 1 row per merge
            if not top:
                break  # no pairs left — the lazy chain also went empty
            out_rows.append(top[0])
            if i < n_merges:
                # persist (not localCheckpoint): the cache populates
                # inside the NEXT round's argmax job — no separate
                # materialization job per merge — and unpersists below
                cur = cur.withColumn(
                    "syms",
                    merge_pair("syms", F.lit(top[0].left_sym),
                               F.lit(top[0].right_sym)),
                ).persist()
                persisted.append(cur)
    finally:
        for p in persisted:
            p.unpersist()
    return docs.sparkSession.createDataFrame(out_rows, schema)


def _inmem_bpe(words: list[tuple[str, int]], n_merges: int):
    """Exact sequential BPE over a collected ``(word, freq)`` vocabulary
    — pair-indexed so each merge touches only the words containing the
    winning pair (the standard exact trainer datastructure; per-merge
    cost is O(occurrences), not O(|V|)). Tie-break matches the
    distributed/oracle rule exactly: (count desc, left asc, right asc).
    Returns [(rank, left, right, weight)]."""
    from collections import Counter, defaultdict

    syms = {w: list(w) for w, _ in words}
    freq = dict(words)
    counts: Counter = Counter()
    where: defaultdict = defaultdict(set)  # pair -> words containing it
    for w, s in syms.items():
        f = freq[w]
        for i in range(len(s) - 1):
            p = (s[i], s[i + 1])
            counts[p] += f
            where[p].add(w)
    out = []
    for rank in range(1, n_merges + 1):
        live = [(c, p) for p, c in counts.items() if c > 0]
        if not live:
            break
        c, (a, b) = min(live, key=lambda t: (-t[0], t[1]))
        out.append((rank, a, b, int(c)))
        ab = a + b
        for w in list(where.get((a, b), ())):
            s = syms[w]
            f = freq[w]
            # remove the word's old pair contributions
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                counts[p] -= f
                where[p].discard(w)
            # greedy leftmost merge
            ns = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    ns.append(ab)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            syms[w] = ns
            for i in range(len(ns) - 1):
                p = (ns[i], ns[i + 1])
                counts[p] += f
                where[p].add(w)
    return out


def bpe_train_fast(docs: DataFrame, tokens: Column, n_merges: int,
                   min_freq: int = 1,
                   max_vocab_words: int = 1_000_000) -> DataFrame:
    """Exact BPE training at tokenizer-real merge counts — the scale
    path the per-merge distributed loop (``bpe_train``) cannot reach:
    at 30k merges one Spark job per merge is a driver-latency wall
    (r6 verdict), and EXACT batching cannot fix it (the provably-safe
    batch — pairwise-disjoint symbols/products, count strictly above
    every interaction bound — measures 1-4 merges per round on real
    text, because top pairs share letters).

    This is instead the shape every production trainer uses
    (HuggingFace tokenizers, SentencePiece): the corpus-wide work is
    ONE distributed shuffle down to the ``(word, freq)`` vocabulary
    relation — 5-6 orders smaller than the corpus at any scale — which
    is then capped to the ``max_vocab_words`` highest-frequency words
    (deterministic: freq desc, word asc; real trainers prune exactly
    this way via min_frequency/vocab caps) and collected for exact
    in-memory pair-indexed training. Corpus bytes never reach the
    driver; the collect is bounded by the cap, same class as the
    k-means centroid collect. Total Spark jobs: 1, independent of
    ``n_merges``. Result is bit-identical to ``bpe_train`` whenever
    the cap does not bind (same tie-break, same greedy-leftmost
    apply)."""
    vocab = (
        word_freq(docs, tokens)
        .filter(F.col("freq") >= min_freq)
        .orderBy(F.desc("freq"), F.asc("w"))
        .limit(max_vocab_words)
    )
    words = [(r["w"], int(r["freq"])) for r in vocab.collect()]
    rows = _inmem_bpe(words, n_merges)
    return docs.sparkSession.createDataFrame(
        rows,
        "merge_rank int, left_sym string, right_sym string, "
        "pair_weight bigint",
    )


def bpe_subword_lengths(docs: DataFrame, tokens: Column,
                        n_merges: int = 4):
    """The APPLY side of the train→apply loop: ``(w, n_syms)`` — each
    corpus word's subword-token count under the first ``n_merges``
    learned merges, as one lazy graph (the merges steer the plan as
    broadcast 1-row joins; no driver literals). Returns ``(cached,
    lengths)``; the caller unpersists ``cached`` after materializing."""
    cached, cur, _ = _train_chain(docs, tokens, n_merges)
    return cached, cur.select("w", F.size("syms").alias("n_syms"))
