"""cudf.api parity namespace (reference python/cudf/cudf/api/)."""

from pygdf_spark.api import extensions, types  # noqa: F401
