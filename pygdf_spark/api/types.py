"""cudf.api.types parity (reference python/cudf/cudf/api/types.py).

The reference's predicates introspect numpy/pandas dtypes because its
columns ARE device arrays with numpy dtypes. Here a column's type is a
Spark SQL ``DataType`` (or its DDL string), so every predicate accepts:

- a Spark ``DataType`` instance or DDL/type string (``"bigint"``),
- a veneer ``Series`` (introspects its Spark schema),
- any numpy/pandas dtype or host scalar (delegates to ``pandas.api.types``
  so host-side call sites keep working unchanged).
"""

from __future__ import annotations

from pandas.api import types as _pd_types

_NUMERIC = {
    "tinyint", "smallint", "int", "integer", "bigint", "long",
    "float", "double", "real",
}
_INTEGER = {"tinyint", "smallint", "int", "integer", "bigint", "long"}
_STRING = {"string", "varchar", "char"}


def _spark_type_name(obj) -> str | None:
    """Resolve obj to a lowercase Spark type name, or None if it isn't
    Spark-typed (then we fall back to pandas.api.types)."""
    try:
        from pyspark.sql.types import DataType
        if isinstance(obj, DataType):
            return obj.simpleString().split("(")[0].split("<")[0]
    except ImportError:  # pragma: no cover
        pass
    # veneer Series: look up its column's type in the parent schema
    if hasattr(obj, "_parent") and hasattr(obj, "_name"):
        try:
            sdf = obj._parent._sdf
            t = sdf.schema[obj._name].dataType.simpleString()
            return t.split("(")[0].split("<")[0]
        except Exception:
            return None
    if isinstance(obj, str):
        base = obj.strip().lower().split("(")[0].split("<")[0]
        known = _NUMERIC | _STRING | {
            "boolean", "timestamp", "timestamp_ntz", "date", "decimal",
            "array", "map", "struct", "binary", "interval", "void",
        }
        return base if base in known else None
    return None


def is_numeric_dtype(obj) -> bool:
    t = _spark_type_name(obj)
    if t is not None:
        return t in _NUMERIC or t == "decimal"
    return bool(_pd_types.is_numeric_dtype(obj))


def is_integer_dtype(obj) -> bool:
    t = _spark_type_name(obj)
    if t is not None:
        return t in _INTEGER
    return bool(_pd_types.is_integer_dtype(obj))


def is_float_dtype(obj) -> bool:
    t = _spark_type_name(obj)
    if t is not None:
        return t in {"float", "double", "real"}
    return bool(_pd_types.is_float_dtype(obj))


def is_string_dtype(obj) -> bool:
    t = _spark_type_name(obj)
    if t is not None:
        return t in _STRING
    return bool(_pd_types.is_string_dtype(obj))


def is_bool_dtype(obj) -> bool:
    t = _spark_type_name(obj)
    if t is not None:
        return t == "boolean"
    return bool(_pd_types.is_bool_dtype(obj))


def is_datetime_dtype(obj) -> bool:
    t = _spark_type_name(obj)
    if t is not None:
        return t in {"timestamp", "timestamp_ntz", "date"}
    return bool(_pd_types.is_datetime64_any_dtype(obj))


is_datetime64_dtype = is_datetime_dtype
is_datetime64_any_dtype = is_datetime_dtype


def is_timedelta_dtype(obj) -> bool:
    t = _spark_type_name(obj)
    if t is not None:
        return t.startswith("interval")
    return bool(_pd_types.is_timedelta64_dtype(obj))


is_timedelta64_dtype = is_timedelta_dtype


def is_categorical_dtype(obj) -> bool:
    """No dictionary-encoded physical type in the engine (SURVEY §1.2);
    true only for the veneer's CategoricalDtype marker / pandas
    categoricals."""
    from pygdf_spark import CategoricalDtype
    if isinstance(obj, CategoricalDtype):
        return True
    if _spark_type_name(obj) is not None:
        return False
    return isinstance(obj, _pd_types.CategoricalDtype) or bool(
        isinstance(getattr(obj, "dtype", None), _pd_types.CategoricalDtype)
    )


def is_list_dtype(obj) -> bool:
    t = _spark_type_name(obj)
    return t == "array"


def is_struct_dtype(obj) -> bool:
    t = _spark_type_name(obj)
    return t == "struct"


def is_decimal_dtype(obj) -> bool:
    t = _spark_type_name(obj)
    return t == "decimal"


def is_interval_dtype(obj) -> bool:
    """IntervalDtype = struct<left,right> (SURVEY §1.2)."""
    from pygdf_spark import IntervalDtype
    if isinstance(obj, IntervalDtype):
        return True
    if isinstance(obj, str):
        s = obj.replace(" ", "").lower()
        return s.startswith("struct<left:") and ",right:" in s
    return False


def is_scalar(val) -> bool:
    return _pd_types.is_scalar(val) or val is None


def is_integer(obj) -> bool:
    return _pd_types.is_integer(obj)


def is_list_like(obj) -> bool:
    return _pd_types.is_list_like(obj)


def is_dict_like(obj) -> bool:
    return _pd_types.is_dict_like(obj)


# pure host-side pandas delegations (reference api/types.py:234-256
# re-exports these verbatim from pandas.api.types)
is_complex_dtype = _pd_types.is_complex_dtype
is_object_dtype = _pd_types.is_object_dtype
is_iterator = _pd_types.is_iterator
is_hashable = _pd_types.is_hashable
is_re = _pd_types.is_re
is_re_compilable = _pd_types.is_re_compilable
pandas_dtype = _pd_types.pandas_dtype
