"""pygdf_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of rapidsai/pygdf (cuDF generation).

The reference is an eagerly-executed columnar operator library
(see SURVEY.md); here every operator is re-expressed as a declarative
Spark DataFrame/SQL plan so Catalyst + Tungsten own the physical
execution (pushdown, partial aggregation, broadcast joins, AQE).

Top-level namespace mirrors ``import cudf`` call sites:
``DataFrame``/``Series``, ``read_csv``/``read_parquet``/``read_orc``/
``read_json``/``read_feather``/``read_hdf`` (returning the compat
DataFrame), the module-level reshape API ``concat``/``melt``/
``pivot``/``get_dummies``, and the tool functions ``to_datetime``/
``cut``/``date_range``.
"""

from pygdf_spark.core import (  # noqa: F401
    DataFrame,
    Series,
    concat,
    from_spark,
    get_dummies,
    melt,
    pivot,
)
from pygdf_spark.session import get_spark, tables


def read_csv(filepath, spark=None, **kwargs) -> "DataFrame":
    """cudf.read_csv (io/csv.py, csv.hpp:1124) → compat DataFrame."""
    from pygdf_spark.sources import io

    return from_spark(io.read_csv(spark or get_spark(), filepath, **kwargs))


def read_parquet(filepath, spark=None, **kwargs) -> "DataFrame":
    """cudf.read_parquet (io/parquet.py:164) → compat DataFrame."""
    from pygdf_spark.sources import io

    return from_spark(io.read_parquet(spark or get_spark(), filepath, **kwargs))


def read_orc(filepath, spark=None, **kwargs) -> "DataFrame":
    """cudf.read_orc (orc.hpp:363) → compat DataFrame."""
    from pygdf_spark.sources import io

    return from_spark(io.read_orc(spark or get_spark(), filepath, **kwargs))


def read_json(filepath, spark=None, **kwargs) -> "DataFrame":
    """cudf.read_json (json.hpp:308) → compat DataFrame."""
    from pygdf_spark.sources import io

    return from_spark(io.read_json(spark or get_spark(), filepath, **kwargs))


def read_feather(filepath, spark=None, **kwargs) -> "DataFrame":
    """cudf.read_feather (io/feather.py) → compat DataFrame."""
    from pygdf_spark.sources import io

    return from_spark(io.read_feather(spark or get_spark(), filepath, **kwargs))


def read_hdf(filepath, spark=None, **kwargs) -> "DataFrame":
    """cudf.read_hdf (io/hdf.py) → compat DataFrame (PyTables-gated)."""
    from pygdf_spark.sources import io

    return from_spark(io.read_hdf(spark or get_spark(), filepath, **kwargs))


def to_datetime(arg, format: str | None = None):
    """cudf.to_datetime (core/tools/datetimes.py) — Column in, Column
    out; strptime directives mapped onto Spark's pattern letters."""
    from pyspark.sql import functions as F

    from pygdf_spark.functions.strings import _STRPTIME_TO_SPARK, _c

    col = _c(arg)
    if format is None:
        return F.to_timestamp(col)
    for k, v in _STRPTIME_TO_SPARK.items():
        format = format.replace(k, v)
    return F.to_timestamp(col, format)


def cut(col, bins: list, labels: list | None = None):
    """cudf.cut (core/cut.py:15; labeling/label_bins.hpp:72) — assign
    each value to a right-closed bin (a, b]. Returns the label when
    `labels` is given, else the 0-based bin index; out-of-range → null
    (cuDF NA). Arbitrary edges, so this is an array rank against the
    edge list, not equal-width width_bucket."""
    from pyspark.sql import functions as F

    from pygdf_spark.functions.strings import _c

    c = _c(col)
    edges = F.array(*[F.lit(float(b)) for b in bins])
    below = F.size(F.filter(edges, lambda e: e < c))
    valid = (c > F.lit(float(bins[0]))) & (c <= F.lit(float(bins[-1])))
    idx = F.when(valid, below)  # 1-based bucket, null outside
    if labels is not None:
        return F.element_at(F.array(*[F.lit(v) for v in labels]), idx)
    return idx - 1


def date_range(start: str, periods: int, freq: str = "1 day", spark=None) -> "DataFrame":
    """cudf.date_range (core/tools/datetimes.py region) — `periods`
    timestamps stepping `freq` from `start`, column ``ts``. Built on
    spark.range so generation is distributed, not a driver-side list."""
    from pyspark.sql import functions as F

    s = spark or get_spark()
    step = F.expr(f"INTERVAL {freq}")
    sdf = s.range(int(periods)).select(
        (F.lit(start).cast("timestamp") + step * F.col("id")).alias("ts")
    )
    return from_spark(sdf)


def interval_range(start, end, freq=1, spark=None) -> "DataFrame":
    """cudf.interval_range (core/index.py:2620) — IntervalDtype is a
    struct of (left, right) edges (SURVEY.md §1.2); generated
    distributed from spark.range, column ``interval``."""
    from pyspark.sql import functions as F

    s = spark or get_spark()
    n = int((end - start) // freq)
    sdf = s.range(n).select(
        F.struct(
            (F.lit(start) + F.col("id") * F.lit(freq)).alias("left"),
            (F.lit(start) + (F.col("id") + 1) * F.lit(freq)).alias("right"),
        ).alias("interval")
    )
    return from_spark(sdf)


__all__ = [
    "DataFrame", "Series", "concat", "from_spark", "get_dummies", "melt",
    "pivot", "get_spark", "tables", "read_csv", "read_parquet", "read_orc",
    "read_json", "read_feather", "read_hdf", "to_datetime", "cut",
    "date_range", "interval_range",
]
__version__ = "0.1.0"
