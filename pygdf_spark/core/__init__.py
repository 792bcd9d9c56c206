from pygdf_spark.core.dataframe import DataFrame, from_spark  # noqa: F401
from pygdf_spark.core.multiindex import MultiIndex  # noqa: F401
from pygdf_spark.core.reshape import concat, get_dummies, melt, pivot, unstack  # noqa: F401
from pygdf_spark.core.series import Series  # noqa: F401
