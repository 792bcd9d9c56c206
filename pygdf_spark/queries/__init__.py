"""Query registry: every implemented operator from SURVEY.md §2 gets a
named query (Spark callable) and, where SQL-expressible, a DuckDB oracle.

Modules register themselves via their QUERIES / ORACLE dicts; this
package aggregates them for ``__spark_entry__.py`` and ``bench.py``.
"""

from __future__ import annotations

from importlib import import_module

_MODULES = [
    "relational",
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
    # r3 window: 47 of the 84 queries with no driver-green row in
    # CORRECTNESS_r01/r02 (tools/rotate_window.py) plus the 3 net-new
    # r3 queries (avro round-trip, conditional semi/anti joins — the
    # r2 verdict asks for driver-green rows on them); the remaining 37
    # (sampling, mm stubs, sstream variants, udf variants, remaining
    # sim_*, transpose/reverse/repeat utils) rotate in next round.
    # Prior-green rows are cumulative.
    "io_avro_roundtrip", "join_conditional_semi", "join_conditional_anti",
    # as-of variants + event analytics
    "asof_join_forward", "asof_join_nearest",
    "events_funnel", "events_cohort_retention",
    # aggregates not yet driver-checked
    "agg_winsorize", "agg_sketch_approx", "agg_grouping_sets",
    # reshape / copying
    "reshape_get_dummies", "reshape_sequence", "reshape_interleave",
    "reshape_cut_bins", "reshape_qcut_bins",
    "is_sorted_check", "hash_partition_hist",
    # strings: the 7 packs without a driver row
    "str_rsplit_pack", "str_find_pack", "str_split_pack", "str_is_pack",
    "str_translate_strip", "str_distance", "str_url_wrap_pack",
    "str_convert_pack",
    # datetimes / dtypes / misc
    "dt_duration_pack", "dt_window_bucket",
    "interval_range_ops", "byte_cast_pack",
    # lists HOFs
    "list_fold_norm", "list_transform_slice",
    # text analysis family
    "text_vocab_coverage", "text_bm25_topk", "text_lm_frequency",
    "text_ngrams_top", "text_langid", "text_quality",
    "text_fingerprint", "text_repetition",
    # NLP
    "nlp_subword_tokenize", "nlp_char_ngrams", "nlp_porter_measure",
    "nlp_normalize_chars", "nlp_edit_distance_matrix",
    # graph + composite pipelines
    "graph_pagerank", "pipeline_neardup_prune",
    # dedup family remainder
    "dedup_incremental", "dedup_prefix_groups", "dedup_ngram_jaccard",
    "dedup_decontaminate",
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
