"""pygdf_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of rapidsai/pygdf (cuDF generation).

The reference is an eagerly-executed columnar operator library
(see SURVEY.md); here every operator is re-expressed as a declarative
Spark DataFrame/SQL plan so Catalyst + Tungsten own the physical
execution (pushdown, partial aggregation, broadcast joins, AQE).
"""

from pygdf_spark.session import get_spark, tables

__all__ = ["get_spark", "tables"]
__version__ = "0.1.0"
