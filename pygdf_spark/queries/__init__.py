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
    # r7 window (standing rule, VERDICT r6 Next #10): never-checked
    # queries first, then every row whose IMPLEMENTATION FILES changed
    # since its last green round, topped up with the rows whose latest
    # driver-green is OLDEST (all r1). Prior-green rows are cumulative —
    # queries rotated out keep their rows.
    # -- never driver-checked (r7 continuation):
    "mm_video_mjpeg",        # AVI/MJPEG container + JPEG frame decode
    "mm_audio_spectrogram",  # per-frame rfft spectral features (Parseval)
    "lake_partition_evolution",  # spec evolution + hybrid metadata/DV DML
    "lake_sql_surface",      # Delta-style SQL statement dispatch
    "lake_copy_into",        # idempotent bulk-file ingestion (skip-set)
    # -- never driver-checked (net-new r7):
    "mi_row_roundtrip",      # row MultiIndex set_index/groupby(level)/unstack
    "io_csv_options",        # skiprows/nrows/skipfooter/parse_dates
    "nlp_bpe_train_fast",    # 1-job exact BPE vs 48 sequential oracle CTEs
    "lake_replace_where",    # Delta replaceWhere: predicate-scoped overwrite
    "lake_partition_prune",  # hive partitions: metadata DELETE + log pruning
    "lake_update_where",     # copy-on-write UPDATE with touch detection
    "lake_incremental_lsh",  # CDF-driven incremental MinHash index
    # -- never driver-checked (r7 close-out additions):
    "lake_column_mapping",   # metadata-only RENAME/DROP COLUMN
    "lake_shallow_clone",    # zero-copy clone + divergent DML
    "graph_bfs_hops",        # multi-source frontier BFS
    "profile_documents",     # one-pass column profiler
    "mm_jpeg_decode",        # baseline JPEG decode (real bitstreams)
    "events_ewma_trend",     # exact integer Holt smoothing per series
    "sstream_lake_merge_live",  # streaming CDC MERGE apply, exactly-once
    "sim_knn_join",          # two-sided multi-probe LSH kNN join
    "lake_type_widening",    # metadata-only ALTER COLUMN TYPE
    "mm_webdataset_jpeg",    # JPEG members through WebDataset shards
    # -- changed since last green (r7 edits):
    #    deltalite.py: LogStore seam + distributed stats harvest + bloom
    #    kind guard + null-count gating; late-r7: require_unchanged
    #    rewrite guards, partition layout/fast path, recursive vacuum,
    #    partition-aware sink (all 13 lake/stream-lake rows)
    "lake_snapshot_read", "lake_time_travel", "lake_file_skipping",
    "lake_merge_upsert", "lake_delete_dv", "lake_restore",
    "lake_change_feed", "lake_zorder_skip", "lake_bloom_skip",
    "lake_incremental_matview",
    "sstream_lake_source_live",  # content-based change-commit classifier
    "sstream_lake_cdf_live", "sstream_lake_sink_live",
    #    sources/io.py: remote-FS dispatch generalized (s3/gs/hdfs)
    "io_csv_roundtrip",
    #    operators/bpe.py grew the fast path; oracle CTEs MATERIALIZED
    "nlp_bpe_train", "nlp_bpe_encode",
    #    core/dataframe.py: columns property + groupby/unstack/reset
    #    grew row-MI handling — re-check the veneer-surface rows
    "mi_xs_level", "take_slice_split", "reverse_tail", "groupby_describe",
    # -- oldest-green rotation (latest green r1; cumulative rows kept):
    "q6_forecast_revenue", "join_inner_q3", "join_semi", "join_anti",
    "agg_basic_stats", "win_group_cumsum", "join_salted_skew",
    "agg_quantiles", "agg_idxmax", "agg_rollup", "agg_global_reduce",
    "sort_multi_nulls", "topk_orders", "dedup_keep_first",
    "win_rolling_var", "agg_bool_any_all", "win_rolling_time",
    "win_rolling_rows", "join_left_outer", "join_full_outer",
    "agg_corr_cov", "dedup_distinct", "value_counts",
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
