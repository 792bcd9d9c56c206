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
    "multimodal",
    "pipeline",
    "udf_apply",
    "streaming_batch",
    "streaming_live",
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
    return queries, oracle
