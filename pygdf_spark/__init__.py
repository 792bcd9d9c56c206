"""pygdf_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of rapidsai/pygdf (cuDF generation).

The reference is an eagerly-executed columnar operator library
(see SURVEY.md); here every operator is re-expressed as a declarative
Spark DataFrame/SQL plan so Catalyst + Tungsten own the physical
execution (pushdown, partial aggregation, broadcast joins, AQE).

Top-level namespace mirrors ``import cudf`` call sites:
``DataFrame``/``Series``, ``read_csv``/``read_parquet``/``read_orc``/
``read_json`` (returning the compat DataFrame), and the module-level
reshape API ``concat``/``melt``/``pivot``/``get_dummies``.
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


__all__ = [
    "DataFrame", "Series", "concat", "from_spark", "get_dummies", "melt",
    "pivot", "get_spark", "tables", "read_csv", "read_parquet", "read_orc",
    "read_json",
]
__version__ = "0.1.0"
