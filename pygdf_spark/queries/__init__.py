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
    # joins: null-safe + as-of (round-1 hash FAILs, now cast at the boundary)
    "join_nullsafe", "asof_join_events",
    # grouped fill (third round-1 hash FAIL) + aggregates
    "group_fill_bfill", "groupby_describe",
    # reshape + copying/hashing
    "reshape_explode", "reshape_factorize", "take_slice_split",
    "hash_values_row", "searchsorted_bounds", "reshape_concat_union",
    # set-like + sorted-merge + sampling
    "set_intersect_except", "merge_sorted_union", "sample_hash",
    # strings / datetimes / scalar math / dtypes (+ categorical accessor)
    "str_basic_pack", "str_json_pack", "str_regex_pack",
    "dt_extract_pack", "dt_arith_pack", "dt_epoch_pack",
    "unary_math_pack", "binary_ops_pack", "rounding_pack", "null_nan_pack",
    "cast_matrix_pack", "decimal_arith_pack", "cat_accessor",
    "dict_encode_decode", "interval_contains",
    # lists / structs
    "list_ops_pack", "struct_pack",
    # windows: rolling UDF (the one §2.5 surface with no driver row)
    "rolling_apply_fold",
    # text analysis + NLP
    "text_token_stats", "nlp_token_filter", "text_pii_mask",
    # LLM dedup family
    "dedup_minhash_lsh", "dedup_keep_list", "dedup_exact_hash",
    "dedup_simhash",
    # similarity search
    "sim_cosine_topk", "sim_ivf_topk", "sim_lsh_buckets",
    # graph + multimodal + composite pipeline
    "graph_connected_components", "mm_binary_meta", "pipeline_curation",
    # UDF surface
    "udf_apply_rows_charge", "udf_grouped_agg_cents",
    # streaming: batch-checkable + live micro-batch + custom stateful
    "stream_tumbling_window", "stream_session_window",
    "sstream_tumbling_live", "sstream_stateful_counts",
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
