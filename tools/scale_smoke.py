"""Scale-stress smoke: replicate the sf0.1 tables N× into /tmp and time
the headline operator families on the inflated data. The point is the
SHAPE of the scaling curve, not the absolute numbers — a plan that is
linear from sf0.1 → N×sf0.1 on local[32] is shuffle/skew-sane; a
super-linear one has a hidden quadratic (hot-key join, unpartitioned
window) that would fall over on a real cluster.

Usage: python tools/scale_smoke.py [N]      (default 8)
Prints one JSON line per timed query with rows_in and seconds.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pygdf_spark import get_spark
from pygdf_spark.queries import registry

SRC = "/root/testdata/sf0.1"
TABLES = ("lineitem", "orders", "customer", "documents", "embeddings",
          "events", "nation", "region", "supplier", "part")
TIMED = ["q1_pricing_summary", "join_inner_q3", "agg_basic_stats",
         "win_rolling_time", "dedup_minhash_lsh", "sim_cosine_topk",
         "text_token_stats", "dedup_keep_first", "reshape_pivot",
         "win_rank_methods", "udf_apply_rows_charge", "asof_join_events",
         "sim_ivf_topk", "dedup_simhash", "join_salted_skew", "dedup_keep_list",
         "sstream_tumbling_live", "hash_partition_hist", "nlp_token_filter",
         "join_range_bucketed", "graph_connected_components", "mm_feature_stub",
         "sim_kmeans_ivf", "dedup_decontaminate", "dedup_span_fingerprint",
         "text_repetition", "agg_sketch_approx", "text_lm_frequency",
         "sample_mixture", "sim_pq_adc", "asof_join_nearest",
         "dedup_decontaminate_bloom", "agg_winsorize",
         "pipeline_neardup_prune", "udf_map_in_arrow", "text_bm25_topk",
         "graph_pagerank", "dedup_incremental", "dedup_semantic",
         "sample_quality_weighted", "search_hybrid_rrf", "sim_quantize_int8",
         "events_funnel", "events_cohort_retention", "text_vocab_coverage",
         "agg_grouping_sets",
         # r4 additions
         "events_sessionize", "text_tfidf_top", "topk_per_group",
         "win_ntile_bucket", "sample_reservoir", "agg_filtered_pack",
         "join_conditional_left",
         # TPC-H suite (join-heavy / subquery shapes)
         "q2_best_supplier", "q5_local_supplier_volume", "q8_market_share",
         "q9_product_profit", "q11_important_stock", "q13_customer_distribution",
         "q17_small_quantity", "q18_large_volume_customer",
         "q20_potential_promotion", "q21_waiting_supplier",
         # r4 late additions
         "text_chunk_split", "io_csv_roundtrip", "io_json_roundtrip",
         "reshape_pivot_table", "reshape_crosstab",
         # r5 additions (real codecs + fixture-oracle subword)
         "mm_image_decode_png", "mm_image_resize_nn", "mm_audio_decode_wav",
         "nlp_subword_tokenize",
         # r6 additions (sharded ML-interchange IO + web/multimodal layouts)
         "io_npy_roundtrip", "io_safetensors_roundtrip",
         "io_warc_roundtrip", "io_webdataset_roundtrip",
         "mm_webdataset_images",
         # mid-r6 additions (BPE training, timeseries maintenance,
         # corpus stats, distributed model fit)
         "nlp_bpe_train", "events_multires_rollup", "scd2_event_history",
         "text_pmi_bigrams", "ml_gram_suffstats",
         # late-r6 additions (lakehouse txn protocol, GIF frame sampling,
         # training-loop sampling, zip-of-npy shards)
         "lake_snapshot_read", "lake_time_travel", "lake_file_skipping",
         "lake_merge_upsert", "mm_gif_frames", "sample_epoch_shuffle",
         "sample_domain_cap", "io_npz_roundtrip",
         # this-session additions (DV delete, substring dedup, logreg,
         # triangles, heavy hitters, restore)
         "lake_delete_dv", "lake_restore", "dedup_substring_remove",
         "ml_logreg_grad0", "ml_quality_score_apply",
         "graph_triangle_count", "text_heavy_hitters",
         "text_lm_perplexity", "nlp_sentence_split",
         # r7 additions (fast exact BPE, positional CSV options,
         # row-MultiIndex workflow)
         "nlp_bpe_train_fast", "io_csv_options", "mi_row_roundtrip",
         "lake_replace_where", "lake_incremental_lsh",
         # late-r7 additions (hive partitions, copy-on-write UPDATE)
         "lake_partition_prune", "lake_update_where",
         # r7 close-out (column mapping, shallow clone, BFS, profiler,
         # baseline JPEG)
         "lake_column_mapping", "lake_shallow_clone", "graph_bfs_hops",
         "profile_documents", "mm_jpeg_decode",
         # r7 continuation (CDC merge stream, Holt smoothing, kNN join)
         "sstream_lake_merge_live", "events_ewma_trend", "sim_knn_join",
         # r7 late continuation (video codec, FFT spectrogram,
         # partition evolution + hybrid DML)
         "mm_video_mjpeg", "mm_audio_spectrogram",
         "lake_partition_evolution", "lake_sql_surface",
         "lake_copy_into"]


def build(spark, n: int, dst: str) -> None:
    """N-fold replication with key-shifting so join/group cardinalities
    scale too (a pure UNION of identical keys would just deepen hot
    keys instead of widening the domain)."""
    from pyspark.sql import functions as F

    os.makedirs(dst, exist_ok=True)
    shifts = {
        "lineitem": ("l_orderkey", 10_000_000), "orders": ("o_orderkey", 10_000_000),
        "documents": ("doc_id", 1_000_000), "embeddings": ("vec_id", 1_000_000),
        "events": ("event_id", 10_000_000),
    }
    for t in TABLES:
        src = os.path.join(SRC, f"{t}.parquet")
        out = os.path.join(dst, f"{t}.parquet")
        if os.path.exists(out):
            continue
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(src)
        if t in shifts and n > 1:
            key, stride = shifts[t]
            parts = [df.withColumn(key, (F.col(key) + i * stride).cast(df.schema[key].dataType)) for i in range(n)]
            big = parts[0]
            for p in parts[1:]:
                big = big.unionByName(p)
        else:
            big = df
        big.write.mode("overwrite").parquet(out)


def main() -> None:
    only = None
    args = []
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = a.split("=", 1)[1].split(",")
        elif a.startswith("--"):
            raise SystemExit(f"unknown flag {a!r}; use --only=name1,name2")
        else:
            args.append(a)
    n = int(args[0]) if args else 8
    dst = f"/tmp/scale_smoke_x{n}"
    spark = get_spark("scale-smoke")
    build(spark, n, dst)
    queries, _ = registry()
    li = spark.read.parquet(os.path.join(dst, "lineitem.parquet")).count()
    for name in (only or TIMED):
        t0 = time.perf_counter()
        queries[name](spark, dst).write.format("noop").mode("overwrite").save()
        # host load rides along: a curve measured at load ≫ ncpu is
        # neighbor noise, not a plan regression (round-2 lesson — the
        # same binary read 6 s and 137 s for q1 at 32× depending on
        # external load)
        print(json.dumps({"query": name, "x": n, "lineitem_rows": li,
                          "sec": round(time.perf_counter() - t0, 2),
                          "load1": round(os.getloadavg()[0], 1)}))
    spark.stop()


if __name__ == "__main__":
    main()
