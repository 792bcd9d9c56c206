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
    "io_ml",
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
    # r5 window (tools/rotate_window.py): the 28 queries with NO driver
    # row in CORRECTNESS_r01-r04 (the 19 adapted TPC-H suite queries,
    # the 4 IO round-trips, pivot_table/crosstab, chunk split, the 2
    # web-dedup variants), then nlp_subword_tokenize (now carrying a
    # fixture-backed oracle — previously the registry's only
    # `err:no_oracle` row), then re-greens: every query whose code
    # changed AFTER its last driver-green row (the f3dbabb string-layer
    # semantics batch -> the 10 r2/r3-green str_* packs; the e670247
    # tokens() regex-trim -> the r2/r3-green tokens()/ngrams()
    # dependents). Prior-green rows are cumulative — queries rotated
    # out keep their rows.
    # -- never-driver-checked: adapted TPC-H suite (queries/tpch.py)
    "q2_best_supplier", "q4_order_priority", "q5_local_supplier_volume",
    "q7_volume_shipping", "q8_market_share", "q9_product_profit",
    "q10_returned_items", "q11_important_stock", "q12_priority_class",
    "q13_customer_distribution", "q14_promo_revenue", "q15_top_supplier",
    "q16_supplier_cnt", "q17_small_quantity", "q18_large_volume_customer",
    "q19_discounted_revenue", "q20_potential_promotion",
    "q21_waiting_supplier", "q22_global_sales",
    # -- never-driver-checked: IO round-trips + reshape + text/dedup
    "io_csv_roundtrip", "io_orc_roundtrip", "io_json_roundtrip",
    "io_feather_roundtrip", "reshape_pivot_table", "reshape_crosstab",
    "text_chunk_split", "dedup_url_canonical", "dedup_containment",
    # -- first-oracle attempt (fixture-backed WordPiece expectations)
    "nlp_subword_tokenize",
    # -- net-new r5: REAL PNG/WAV decode (pure-Python spec codecs)
    "mm_image_decode_png", "mm_image_resize_nn", "mm_audio_decode_wav",
    # -- net-new r5: ML-interchange IO (npy shard dirs, safetensors)
    "io_npy_roundtrip", "io_safetensors_roundtrip",
    # -- re-green: f3dbabb string-layer dependents (last green r2/r3;
    #    json/find/distance packs omitted — those methods were
    #    untouched by the batch)
    "str_basic_pack", "str_regex_pack",
    "str_rsplit_pack", "str_split_pack",
    "str_is_pack", "str_translate_strip",
    "str_url_wrap_pack",
    # -- re-green: e670247 tokens()/ngrams() dependents (last green
    #    r2/r3; char_ngrams + vocab_coverage omitted — substring/
    #    F.split based, not operators.text.tokens; ngrams_top omitted —
    #    same ngrams() path as dedup_ngram_jaccard which stays)
    "text_token_stats", "nlp_token_filter", "dedup_minhash_lsh",
    "dedup_simhash", "dedup_ngram_jaccard",
    "text_fingerprint", "text_lm_frequency", "text_repetition",
    # -- re-green: r5 dup-HOF fix changed this probe's plan (persisted
    #    index) after its r4 green row
    "sim_ivf_probe",
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
