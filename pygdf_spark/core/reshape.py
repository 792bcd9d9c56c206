"""cuDF top-level reshape API (python/cudf/cudf/core/reshape.py):
``concat`` (:90), ``melt`` (:394), ``get_dummies`` (:566), plus
``pivot``/``unstack`` (:843,:924) — the module-level functions a cuDF
user calls as ``cudf.concat(...)``.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import functions as F

from pygdf_spark.core.dataframe import _RID, DataFrame


def concat(frames: list[DataFrame], join: str = "outer") -> DataFrame:
    """concat axis=0 (reshape.py:90): outer aligns the union of columns
    (missing → null), inner keeps the intersection."""
    sdfs = [f._sdf for f in frames]
    if join == "inner":
        common = list(reduce(lambda a, b: a & b, (set(s.columns) for s in sdfs)))
        keep = [c for c in sdfs[0].columns if c in common and c != _RID]
        sdfs = [s.select(*keep) for s in sdfs]
        out = reduce(lambda a, b: a.unionByName(b), sdfs)
        return DataFrame(out.withColumn(_RID, F.monotonically_increasing_id()))
    out = reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), sdfs)
    if _RID in out.columns:
        out = out.drop(_RID)
    return DataFrame(out.withColumn(_RID, F.monotonically_increasing_id()))


def melt(df: DataFrame, id_vars: list[str], value_vars: list[str],
         var_name: str = "variable", value_name: str = "value") -> DataFrame:
    """melt (reshape.py:394) → Spark unpivot."""
    out = df._sdf.drop(_RID).unpivot(id_vars, value_vars, var_name, value_name)
    return DataFrame(out.withColumn(_RID, F.monotonically_increasing_id()))


def pivot(df: DataFrame, index: str, columns: str, values: str,
          column_values: list | None = None) -> DataFrame:
    """pivot (reshape.py:843): long → wide with first-value semantics.
    Pass ``column_values`` when known — it removes the extra distinct
    scan Spark otherwise needs to discover the pivot domain."""
    g = df._sdf.drop(_RID).groupBy(index)
    p = g.pivot(columns, column_values) if column_values else g.pivot(columns)
    out = p.agg(F.first(values))
    return DataFrame(out.withColumn(_RID, F.monotonically_increasing_id()))


def unstack(df: DataFrame, index: str, columns: str, values: str,
            fill_value=None, column_values: list | None = None) -> DataFrame:
    """unstack (reshape.py:924): move the ``columns`` key into the
    column axis. Under the group-keys-stay-columns convention the
    "level" is named explicitly instead of positionally; first-value
    cells like the reference (each (index, columns) pair is assumed
    unique, as cuDF requires). ``fill_value`` fills ONLY structurally
    missing cells — a pair that exists with a null value keeps its
    null, exactly as pandas (so the pivot carries a presence count per
    cell alongside the value)."""
    if fill_value is None:
        return pivot(df, index, columns, values, column_values)
    g = df._sdf.drop(_RID).groupBy(index)
    p = g.pivot(columns, column_values) if column_values else g.pivot(columns)
    out = p.agg(F.first(values).alias("v"), F.count(F.lit(1)).alias("c"))
    cells = sorted({c[:-2] for c in out.columns if c.endswith(("_v", "_c"))})
    filled = [
        F.when(F.col(f"{c}_c").isNull(), F.lit(fill_value))
        .otherwise(F.col(f"{c}_v")).alias(c)
        for c in cells
    ]
    return DataFrame(
        out.select(index, *filled).withColumn(_RID, F.monotonically_increasing_id())
    )


def get_dummies(df: DataFrame, column: str, prefix: str | None = None,
                values: list | None = None) -> DataFrame:
    """get_dummies / one-hot (reshape.py:566). ``values`` bounds the
    category domain (else one distinct collect — documented small-dim)."""
    pre = prefix if prefix is not None else column
    if values is None:
        values = [r[0] for r in df._sdf.select(column).distinct().collect()]
    cols = [
        F.when(F.col(column) == v, 1).otherwise(0).alias(f"{pre}_{v}")
        for v in sorted(values, key=str)
    ]
    return DataFrame(df._sdf.select(_RID, *[c for c in df.columns], *cols))
