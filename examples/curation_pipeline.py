"""Training-data curation walkthrough: raw corpus → training-ready packs.

Run: python examples/curation_pipeline.py [sf_dir]

Chains the engine's LLM-pipeline operators the way a production corpus
run would, printing stage-by-stage survivor counts. Every stage is a
declarative Spark plan; the comments state the 100 TB shape of each.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pygdf_spark import get_spark
from pygdf_spark.functions.hashing import md5_u64
from pygdf_spark.operators import dedup as D
from pygdf_spark.operators.bloom import bloom_build, bloom_might_contain, bloom_params
from pygdf_spark.operators.graph import connected_components
from pygdf_spark.operators.packing import with_pack_ids
from pygdf_spark.operators.text import ngrams
from pygdf_spark.queries._util import T


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("curation-demo")
    docs = T(spark, sf_dir, "documents")
    n0 = docs.count()
    print(f"corpus: {n0} docs")

    # 1. exact dedup — one fingerprint groupBy; keep the min doc per group
    groups = D.dedup_group_assignment(docs)
    keep = groups.filter(F.col("doc_id") == F.col("rep")).select("doc_id")
    docs = docs.join(keep, "doc_id", "left_semi")
    print(f"after exact dedup: {docs.count()}")

    # 2. near-dup prune — LSH pairs -> connected components -> drop non-reps
    #    (pairs ≪ corpus; CC is O(log D) rounds over pair-sized edges)
    pairs = D.minhash_lsh_dedup(docs, num_perms=6, threshold=0.05)
    cc = connected_components(
        pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    )
    near_rm = cc.filter(F.col("id") != F.col("comp")).select(F.col("id").alias("doc_id"))
    docs = docs.join(near_rm, "doc_id", "left_anti")
    print(f"after near-dup prune: {docs.count()}")

    # 3. decontamination — eval n-grams as a broadcast Bloom BITSET,
    #    in-row exists() probe, exact verify only for bloom positives
    bench = (
        T(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 97 == 0)
        .select(F.explode(F.array_distinct(ngrams("text", 3))).alias("g"))
        .distinct()
    )
    m, k = bloom_params(max(bench.count(), 1), 0.01)
    bits = bloom_build(bench, "g", m, k).withColumnRenamed("bits", "__bits").localCheckpoint()
    cand = (
        docs.filter(F.col("doc_id") % 97 != 0)
        .crossJoin(F.broadcast(bits))
        .withColumn(
            "__hit",
            F.exists(
                F.array_distinct(ngrams("text", 3)),
                lambda g: bloom_might_contain(g, F.col("__bits"), m, k),
            ),
        )
    )
    dirty = (
        cand.filter(F.col("__hit"))
        .select("doc_id", F.explode(F.array_distinct(ngrams("text", 3))).alias("g"))
        .join(F.broadcast(bench), "g")
        .select("doc_id")
        .distinct()
    )
    docs = cand.drop("__bits", "__hit").join(dirty, "doc_id", "left_anti")
    print(f"after decontamination: {docs.count()}")

    # 4. EXACT SUBSTRING dedup (Lee et al. 2022): repeated 6-token
    #    spans keep only their global first occurrence; text is
    #    rebuilt from surviving tokens (one keyed shuffle on span ids)
    cleaned = D.substring_dedup(docs, "doc_id", "text", k=6,
                                carry=["source", "lang"], hashed=True)
    removed = cleaned.agg(F.sum("n_removed")).first()[0]
    docs = cleaned.filter(F.col("clean_text") != "").select(
        "doc_id", "source", "lang", F.col("clean_text").alias("text")
    )
    print(f"after span removal: {docs.count()} docs "
          f"({removed} duplicated tokens cut)")

    # 5. PERPLEXITY-style + trained-classifier quality gate:
    #    (a) self-trained hashed-ngram logistic classifier scores every
    #        doc (training = per-iteration gradient aggregates;
    #        the corpus never leaves the executors)
    from pygdf_spark.operators.linear_model import (
        hashed_ngram_features, logreg_fit, logreg_score,
    )

    feats = hashed_ngram_features(docs, d=64)
    labels = docs.select(
        F.col("doc_id").alias("doc"),
        (F.col("lang") == "en").cast("long").alias("y"),
    )
    model = logreg_fit(spark, feats, labels, d=64, iters=4)
    scores = logreg_score(spark, feats, model)
    docs = docs.join(
        scores.filter(F.col("prob") > 0.2).select(F.col("doc").alias("doc_id")),
        "doc_id", "left_semi",
    )
    print(f"after classifier gate: {docs.count()}")

    # 6. quality-weighted keep — map-side hash-Bernoulli, no RNG state
    keep_pct = F.array(F.lit(100), F.lit(75), F.lit(50), F.lit(25))[
        F.substring("source", 4, 10).cast("int") % 4
    ]
    docs = docs.filter(md5_u64(F.col("doc_id").cast("string")) % 100 < keep_pct)
    print(f"after quality/mixture sampling: {docs.count()}")

    # 7. token-budget packing — running sums inside fixed shards
    toks = F.size(F.split(F.trim("text"), r"\s+"))
    packed = with_pack_ids(docs.select("doc_id", toks.alias("n_tok")), budget=2048, n_shards=8)
    stats = packed.groupBy("shard").agg(
        F.count(F.lit(1)).alias("docs"), (F.max("pack_id") + 1).alias("packs")
    )
    print("packs per shard:")
    for r in stats.orderBy("shard").collect():
        print(f"  shard {r.shard}: {r.docs} docs in {r.packs} packs")

    # 8. land the curated corpus in a CONSTRAINED lakehouse table with
    #    group-aware k-fold assignment — reproducible snapshots, loud
    #    refusal of any future empty-text ingest
    import shutil
    import tempfile

    from pygdf_spark.sources import deltalite as dl

    table = os.path.join(tempfile.gettempdir(), f"curated_{os.getpid()}")
    shutil.rmtree(table, ignore_errors=True)
    fold = (md5_u64(F.concat(F.lit("fold:"), F.col("source"))) % 5).cast("int")
    # PARTITIONED by source: every file is single-valued on `source`, so
    # source-scoped retention/backfill below is pure log metadata
    dl.append(docs.withColumn("fold", fold).repartition(4), table,
              stat_cols=["doc_id"], partition_by=["source"])
    print("partitions:", [
        (r["source"], r["n_rows"])
        for r in dl.show_partitions(spark, table).collect()
    ][:5])
    dl.add_check_constraint(spark, table, "nonempty", "length(text) > 0")
    st = dl.table_stats(table)
    print(f"curated lake table: {st['rows']} rows in {st['files']} files "
          f"(O(log) stats), constraints={list(dl.table_constraints(table))}")

    # 9. corpus MAINTENANCE, the part that runs forever after the build:
    #    (a) a takedown arrives as a tombstone key-frame → MERGE WHEN
    #        MATCHED THEN DELETE (delete-by-join; rewrites only the
    #        files holding those keys)
    takedown = docs.select("doc_id").limit(5)
    res = dl.merge_into(spark, table, takedown, on="doc_id",
                        when_matched="delete", stat_cols=["doc_id"])
    print(f"takedown applied: {res['files_rewritten']} files rewritten "
          f"of {res['files_total']}")
    #    (b) one source re-crawled → replaceWhere backfills JUST that
    #        slice atomically (files wholly inside the predicate drop
    #        as metadata)
    recrawl = dl.read_table(spark, table).filter(
        F.col("source") == "src0"
    ).withColumn("text", F.concat(F.col("text"), F.lit(" [v2]")))
    if recrawl.count() > 0:
        res = dl.overwrite_where(
            spark, recrawl, table, [("source", "=", "src0")],
            stat_cols=["doc_id"],
        )
        print(f"backfill: {res['files_removed']} dropped whole, "
              f"{res['files_rewritten']} boundary rewrites")
    #    (b2) a whole source expires (retention) → partition-scoped
    #         DELETE: zero rows scanned or moved, one log write
    res = dl.delete_where(spark, table, [("source", "=", "src1")])
    print(f"retention drop of src1: {res['rows_deleted']} rows as pure "
          f"metadata ({res['files_touched']} files unlinked from the log)")
    #    (c) downstream indexes refresh from the CHANGE FEED, not a
    #        rescan — see queries/lakehouse.py lake_incremental_lsh for
    #        the full incremental near-dup index protocol
    ch = dl.table_changes(spark, table, 0, dl.table_version(table),
                          key="doc_id")
    print("change feed rows by type:",
          {r['_change_type']: r['n'] for r in
           ch.groupBy("_change_type").agg(F.count("*").alias("n")).collect()})
    shutil.rmtree(table, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
