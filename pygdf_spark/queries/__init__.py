"""Query registry: every implemented operator from SURVEY.md §2 gets a
named query (Spark callable) and, where SQL-expressible, a DuckDB oracle.

Modules register themselves via their QUERIES / ORACLE dicts; this
package aggregates them for ``__spark_entry__.py`` and ``bench.py``.
"""

from __future__ import annotations

from importlib import import_module

_MODULES = [
    "relational",
    "tpch",
    "joins",
    "asof",
    "aggregates",
    "windows",
    "reshape",
    "copying",
    "strings",
    "str_url",
    "datetimes",
    "scalar_math",
    "misc_ops",
    "dtypes",
    "lists_structs",
    "llm_text",
    "timeseries",
    "ml_fit",
    "io_ml",
    "lakehouse",
    "nlp",
    "llm_dedup",
    "llm_similarity",
    "llm_sampling",
    "multimodal",
    "pipeline",
    "udf_apply",
    "streaming_batch",
    "streaming_live",
]


# The round driver checks the FIRST 50 registry entries against the DuckDB
# oracle (round-1 lesson: positions 51+ got no driver correctness row). The
# window is rebuilt each round (tools/rotate_window.py) from queries with NO
# driver-green row in any prior CORRECTNESS_r*.json, hand-ordered to span
# every SURVEY.md §2 family AND every LLM-pipeline component, preferring low
# per-query cost at sf0.01. Queries dropped from the window keep their
# prior-round driver-green rows (CORRECTNESS_r01.json: 47 green).
_PRIORITY = [
    # r6 window: changed-since-green first (VERDICT r5 Next #9), then
    # the 42 rows whose latest driver-green is OLDEST (all r1) so the
    # cumulative ledger stays fresh. Prior-green rows are cumulative —
    # queries rotated out keep their rows.
    # -- changed since last green (r6 code/oracle edits):
    #    q12: oracle SQL gained CAST(...AS BIGINT) (the r5 hash-fail fix)
    #    io_csv: read_csv/write_csv now route through the s3 dispatch
    #    io_npy: TaskContext shard naming + atomic rename
    #    io_safetensors: re-pointed at the sharded mapInPandas write
    #    sim_ivf_probe: eager topk materialization + index unpersist
    #    mm_image_*: vectorized unfilter + IEND strictness
    #    mm_audio: ragged-data-chunk strictness
    "q12_priority_class", "io_csv_roundtrip", "io_npy_roundtrip",
    "io_npz_roundtrip",  # late-r6 zip-of-npy (displaces agg_collect_set)
    "io_safetensors_roundtrip", "sim_ivf_probe",
    "mm_image_decode_png", "mm_image_resize_nn", "mm_audio_decode_wav",
    # -- net-new r6: WARC (Common Crawl) + WebDataset tar-shard sources
    # and the WebDataset->PNG-decode multimodal composite
    "io_warc_roundtrip", "io_webdataset_roundtrip", "mm_webdataset_images",
    # -- oldest-green rotation (every row below last greened in r1):
    # (dedup_substring_remove displaces q6_forecast_revenue, r1-green)
    "dedup_substring_remove",
    "q1_pricing_summary",
    # (triangle/heavy-hitter queries displace join_semi / join_anti,
    # both r1-green with cumulative rows)
    "graph_triangle_count", "text_heavy_hitters",
    # (fuzzy/gapfill/kfold/lake-source displace join_inner_q3,
    # q1_pricing_summary, agg_basic_stats, win_group_cumsum — all
    # r1-green with cumulative rows)
    "dedup_fuzzy_block", "events_gapfill_interp", "sample_kfold_split",
    "sstream_lake_source_live",
    "join_range_bucketed",
    "text_readability",  # displaces join_salted_skew (r1-green)
    "nlp_sentence_split",  # displaces agg_quantiles (r1-green)
    "text_lm_perplexity",  # displaces agg_idxmax (r1-green)
    "lake_bloom_skip",  # displaces agg_rollup (r1-green)
    "sstream_lake_cdf_live",  # displaces agg_global_reduce (r1-green)
    # -- net-new late-r6: deltalite transaction-log table format
    # (displacing sort_multi_nulls / topk_orders / dedup_keep_first,
    # which keep their cumulative r1 driver-green rows):
    # (sstream_lake_sink_live additionally displaces win_rolling_var,
    # r1-green) — exactly-once foreachBatch ingestion into deltalite:
    # (lake_merge_upsert additionally displaces agg_bool_any_all, and
    # lake_zorder_skip displaces win_rolling_time — both r1-green)
    # (lake_change_feed displaces win_rolling_rows, r1-green)
    # (lake_delete_dv / lake_restore displace join_left_outer /
    # join_full_outer, both r1-green with cumulative rows)
    "lake_delete_dv", "lake_restore",
    "lake_snapshot_read", "lake_time_travel", "lake_file_skipping",
    "lake_merge_upsert", "lake_zorder_skip", "lake_change_feed",
    "lake_incremental_matview",  # displaces agg_corr_cov (r1-green)
    "sstream_lake_sink_live",
    # -- net-new mid-r6 (never driver-checked; displaced seven r1-green
    # rows — dedup_distinct, value_counts, filter_isin,
    # ast_filter_string, fillna_coalesce, reshape_melt, reshape_pivot
    # keep their cumulative green rows):
    # -- net-new late-r6 #2: GIF frame sampling + training-loop
    # sampling ops (displacing win_ffill / win_nth_value /
    # win_rank_methods, all r1-green):
    "mm_gif_frames", "sample_epoch_shuffle", "sample_domain_cap",
    "sample_temperature",  # displaces agg_moments (r1-green)
    "nlp_unigram_segment",  # displaces join_cross (r1-green)
    "nlp_bpe_train", "nlp_bpe_encode", "events_multires_rollup",
    "scd2_event_history", "sstream_scd2_changes_live",
    "text_pmi_bigrams", "ml_gram_suffstats",
    # (logreg family displaces join_conditional / join_index_aligned,
    # both r1-green with cumulative rows)
    "ml_logreg_grad0", "ml_quality_score_apply",
]


def registry():
    queries: dict = {}
    oracle: dict = {}
    for mod_name in _MODULES:
        try:
            mod = import_module(f"pygdf_spark.queries.{mod_name}")
        except ImportError:
            continue
        for k, v in getattr(mod, "QUERIES", {}).items():
            assert k not in queries, f"duplicate query name {k}"
            queries[k] = v
        oracle.update(getattr(mod, "ORACLE", {}))
    missing = [n for n in _PRIORITY if n not in queries]
    assert not missing, f"_PRIORITY names not in registry: {missing}"
    ordered = {n: queries[n] for n in _PRIORITY}
    ordered.update((k, v) for k, v in queries.items() if k not in ordered)
    return ordered, oracle
