from pygdf_spark.core.dataframe import DataFrame, from_spark  # noqa: F401
