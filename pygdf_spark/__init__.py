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
    unstack,
)
from pygdf_spark import datasets  # noqa: F401
from pygdf_spark import errors  # noqa: F401  (cudf.errors parity)
from pygdf_spark import testing  # noqa: F401  (cudf.testing parity)
from pygdf_spark.options import (  # noqa: F401
    describe_option,
    get_option,
    set_option,
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


def read_npy_dir(path, spark=None) -> "DataFrame":
    """Sharded .npy embedding directory → (vec_id, embedding) frame
    (net-new ML-interchange source, sources/npy_lite.py)."""
    from pygdf_spark.sources.npy_lite import read_npy_dir as _r

    return from_spark(_r(spark or get_spark(), path))


def read_safetensors(path_glob, spark=None) -> "DataFrame":
    """safetensors file(s) → per-tensor inventory frame (net-new
    ML-interchange source, sources/safetensors_lite.py)."""
    from pygdf_spark.sources.safetensors_lite import read_safetensors as _r

    return from_spark(_r(spark or get_spark(), path_glob))


def read_warc(path_glob, spark=None) -> "DataFrame":
    """WARC shard(s) (plain or Common-Crawl member-gzipped) → one row
    per record (net-new web-corpus source, sources/warc_lite.py)."""
    from pygdf_spark.sources.warc_lite import read_warc as _r

    return from_spark(_r(spark or get_spark(), path_glob))


def read_webdataset(path_glob, spark=None) -> "DataFrame":
    """WebDataset tar shard(s) → one row per (sample key, extension)
    member (net-new multimodal source, sources/webdataset_lite.py)."""
    from pygdf_spark.sources.webdataset_lite import read_webdataset as _r

    return from_spark(_r(spark or get_spark(), path_glob))


def read_deltalite(table, spark=None, version=None, timestamp=None,
                   predicate=None, columns=None) -> "DataFrame":
    """Snapshot-read a deltalite lakehouse table into the compat
    surface: ``version``/``timestamp`` time travel, file skipping via
    ``predicate`` (a [(col, op, literal)] conjunction), early column
    pruning — sources/deltalite.py read_table."""
    from pygdf_spark.sources.deltalite import read_table

    return from_spark(read_table(
        spark or get_spark(), table, version=version, timestamp=timestamp,
        predicate=predicate, columns=columns,
    ))


def to_deltalite(df, table, mode="append", stat_cols=None, cluster_by=None,
                 partition_by=None, partition_exprs=None) -> int:
    """Land a frame (compat or Spark) as an atomic deltalite commit;
    returns the new version. ``mode``: append | overwrite. Partition /
    clustering / stats options as in sources/deltalite.py append."""
    from pygdf_spark.sources import deltalite as dl

    sdf = getattr(df, "_sdf", df)
    sdf = sdf.drop("__row_id") if "__row_id" in sdf.columns else sdf
    fn = {"append": dl.append, "overwrite": dl.overwrite}[mode]
    return fn(sdf, table, stat_cols=stat_cols, cluster_by=cluster_by,
              partition_by=partition_by, partition_exprs=partition_exprs)


def deltalite_ddl():
    """The lakehouse DDL/maintenance toolbox on the compat surface:
    rename_column / drop_column (metadata-only schema evolution),
    set_partition_spec (Iceberg-style partition evolution),
    clone (zero-copy snapshot), set_protocol / table_protocol
    (feature fencing), merge_into, delete_where, update_where,
    overwrite_where, compact, vacuum, restore, table_changes —
    returned as the deltalite module so one import serves all of it."""
    from pygdf_spark.sources import deltalite as dl

    return dl


def lakehouse_sql(spark, statement: str, catalog: dict | None = None):
    """Delta-style SQL statement surface over deltalite tables
    (sources/lakehouse_sql.py): SELECT [VERSION/TIMESTAMP AS OF] /
    INSERT INTO / DELETE / UPDATE / OPTIMIZE [ZORDER BY] / VACUUM /
    RESTORE / ALTER TABLE (rename, drop, widen, partition spec,
    constraints) / DESCRIBE HISTORY / SHOW PARTITIONS — simple WHERE
    conjunctions compile to stats-prunable predicate tuples."""
    from pygdf_spark.sources.lakehouse_sql import sql

    return sql(spark, statement, catalog)


def write_npy_dir(df, path, id_col="vec_id", vec_col="embedding") -> None:
    """(id, vector) frame → sharded .npy directory (one ids/vecs pair
    per partition, executor-local; sources/npy_lite.py)."""
    from pygdf_spark.sources.npy_lite import write_npy_dir as _w

    _w(getattr(df, "_sdf", df), path, id_col, vec_col)


def write_safetensors(df, path, tensor_cols, single_file=False) -> None:
    """frame → sharded safetensors directory (one container per
    partition via mapInPandas; ``single_file=True`` keeps the bounded
    one-container mode behind options.max_driver_rows —
    sources/safetensors_lite.py)."""
    from pygdf_spark.sources.safetensors_lite import write_safetensors as _w

    _w(getattr(df, "_sdf", df), path, tensor_cols, single_file=single_file)


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


def qcut(col, q, labels: list | None = None):
    """pandas/cudf-style qcut over a veneer Series: quantile edges from
    ONE exact-percentile aggregation on the Series' own frame, bucket
    assigned map-side as a boundary comparison (right-closed bins, the
    lowest value included — pandas semantics). `q` is an int
    (equal-frequency bins over the full range) or an explicit quantile
    list (pandas: values OUTSIDE the outer quantiles get null, and a
    k-entry list yields k-1 bins). Returns a Series of 0-based bin
    indices (or `labels`). The edge agg broadcasts a handful of scalars
    — no driver materialization of data rows."""
    from pyspark.sql import functions as F

    from pygdf_spark.core.series import Series as _S

    if not isinstance(col, _S):
        raise TypeError("qcut expects a pygdf_spark Series")
    sdf = col._parent._sdf
    name = col._name
    x = col.col.cast("double")

    if isinstance(q, int):
        if q < 1:
            raise ValueError("q must be a positive integer or a quantile list")
        inner = [i / q for i in range(1, q)]   # interior edges only
        outer = None                           # full range: every row valid
    else:
        qs = sorted(float(p) for p in q)
        if len(qs) < 2:
            raise ValueError("quantile list needs at least 2 entries")
        inner = qs[1:-1]
        outer = (qs[0], qs[-1])

    # alias prefix chosen to be collision-proof against user columns
    pfx = "__pygdf_qcut_"
    probs = ([] if outer is None else [outer[0]]) + inner + (
        [] if outer is None else [outer[1]]
    )
    if not probs:
        # q == 1: single bin, no edges needed
        expr = F.lit(labels[0]) if labels is not None else F.when(
            x.isNotNull(), F.lit(0)
        )
        return from_spark(
            sdf.select(*[c for c in sdf.columns if c != name], expr.alias(name))
        )[name]
    edges = sdf.agg(
        *[F.percentile(x, p).alias(f"{pfx}{i}") for i, p in enumerate(probs)]
    )
    if outer is None:
        inner_cols = [F.col(f"{pfx}{i}") for i in range(len(probs))]
        valid = x.isNotNull()
    else:
        lo, hi = F.col(f"{pfx}0"), F.col(f"{pfx}{len(probs) - 1}")
        inner_cols = [F.col(f"{pfx}{i}") for i in range(1, len(probs) - 1)]
        valid = (x >= lo) & (x <= hi)
    b = sum(((x > e).cast("int") for e in inner_cols), F.lit(0))
    expr = F.when(valid, b)
    if labels is not None:
        expr = F.element_at(F.array(*[F.lit(v) for v in labels]), expr + 1)
    keep = [c for c in sdf.columns if not c.startswith(pfx) and c != name]
    out = sdf.crossJoin(F.broadcast(edges)).select(*keep, expr.alias(name))
    return from_spark(out)[name]


def pivot_table(data: "DataFrame", values: str, index, columns: str,
                aggfunc: str = "mean", fill_value=None) -> "DataFrame":
    """cudf/pandas pivot_table — groupBy(index).pivot(columns).agg: one
    shuffle on the index keys; the pivot column domain is resolved by
    Spark (distinct scan) and becomes output columns."""
    from pyspark.sql import functions as F

    index = [index] if isinstance(index, str) else list(index)
    agg = getattr(F, {"mean": "avg"}.get(aggfunc, aggfunc))
    # pandas dropna=True: null index keys and null pivot labels are
    # dropped, and fill_value fills only the VALUE cells (never keys)
    src = data._sdf.na.drop(subset=index + [columns])
    out = src.groupBy(*index).pivot(columns).agg(agg(values))
    if fill_value is not None:
        value_cols = [c for c in out.columns if c not in index]
        out = out.na.fill(fill_value, subset=value_cols)
    return from_spark(out)


def crosstab(data: "DataFrame", index: str, columns: str) -> "DataFrame":
    """pandas.crosstab over distributed data: count matrix of
    index × columns (groupBy + pivot + count — one shuffle)."""
    from pyspark.sql import functions as F

    src = data._sdf.na.drop(subset=[index, columns])  # pandas dropna=True
    out = src.groupBy(index).pivot(columns).agg(F.count(F.lit(1)))
    return from_spark(out.na.fill(0, subset=[c for c in out.columns if c != index]))


class option_context:
    """cudf.option_context — set options inside a with-block, restore on
    exit (pandas semantics)."""

    def __init__(self, *args):
        if len(args) % 2:
            raise ValueError("option_context takes name/value pairs")
        self._pairs = list(zip(args[::2], args[1::2]))
        self._saved: list = []

    def __enter__(self):
        self._saved = [(n, get_option(n)) for n, _ in self._pairs]
        for n, v in self._pairs:
            set_option(n, v)
        return self

    def __exit__(self, *exc):
        for n, v in self._saved:
            set_option(n, v)
        return False


def from_dlpack(obj):
    """cudf.from_dlpack (interop.hpp:40) — GPU tensor exchange has no
    analog in a JVM engine (SURVEY.md §2.1 declares DLPack n/a); Arrow
    is the interchange format here."""
    raise NotImplementedError(
        "DLPack is a GPU device-memory exchange; use Arrow instead — "
        "spark.createDataFrame(pandas_df) in, DataFrame.to_pandas()/"
        "mapInArrow out carry Arrow buffers end-to-end."
    )


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
    "read_json", "read_feather", "read_hdf", "read_avro",
    "read_npy_dir", "read_safetensors", "read_warc", "read_webdataset",
    "write_npy_dir", "write_safetensors", "to_datetime",
    "cut", "qcut", "pivot_table", "crosstab", "option_context",
    "from_dlpack", "testing",
    "date_range", "interval_range", "NA", "from_pandas", "merge",
    "factorize", "to_numeric", "isclose", "merge_sorted", "DateOffset",
    "register_dataframe_accessor", "register_series_accessor",
    "register_index_accessor", "set_allocator", "validate_setup",
    "get_versions", "CategoricalDtype", "ListDtype", "StructDtype",
    "IntervalDtype", "Decimal32Dtype", "Decimal64Dtype",
    "add", "subtract", "multiply", "true_divide", "floor_divide",
    "remainder", "sin", "cos", "tan", "arcsin", "arccos", "arctan",
    "exp", "log", "sqrt", "logical_and", "logical_or", "logical_not",
]
__version__ = "0.1.0"


# -- module-level parity batch (cudf/__init__.py namespace) ---------------

#: cudf.NA — the missing-value sentinel; the engine's missing value is
#: SQL NULL, which surfaces as Python None.
NA = None


def from_pandas(obj, spark=None):
    """cudf.from_pandas — DataFrame or Series."""
    import pandas as pd

    from pygdf_spark.core.dataframe import from_pandas as _fp
    from pygdf_spark.core.series import Series as _S

    s = spark or get_spark()
    if isinstance(obj, pd.Series):
        return _S.from_pandas(s, obj)
    return _fp(s, obj)


def merge(left: "DataFrame", right: "DataFrame", on=None, how: str = "inner",
          suffixes=("_x", "_y")) -> "DataFrame":
    """cudf.merge (module-level spelling of DataFrame.merge)."""
    return left.merge(right, on=on, how=how, suffixes=tuple(suffixes))


def merge_asof(left: "DataFrame", right: "DataFrame", on: str, by=None,
               direction: str = "backward", tolerance=None,
               allow_exact_matches: bool = True,
               suffixes=("_x", "_y")) -> "DataFrame":
    """pandas/cudf-style merge_asof over the distributed as-of operator
    (operators/asof.py; this pygdf generation has no merge_asof — the
    surface mirrors the one later cuDF grew). Inputs need not be
    pre-sorted (the window pass sorts per key). `tolerance` accepts a
    number in the ts column's native units (µs for timestamps) or any
    object with total_seconds() (e.g. pandas.Timedelta / datetime.timedelta).
    """
    from pyspark.sql import functions as F

    from pygdf_spark.core.dataframe import _RID, DataFrame as _DF
    from pygdf_spark.operators.asof import asof_join

    by = [by] if isinstance(by, str) else list(by or [])
    if tolerance is not None and hasattr(tolerance, "total_seconds"):
        # exact integer µs: float total_seconds()*1e6 truncates (249µs→248µs)
        td = tolerance
        if hasattr(td, "days"):  # datetime.timedelta / pandas.Timedelta
            tolerance = (td.days * 86_400 + td.seconds) * 1_000_000 + td.microseconds
        else:
            tolerance = int(round(td.total_seconds() * 1_000_000))
    lsdf = left._sdf
    # the right frame's row-order id doubles as the pandas tiebreak for
    # duplicate (by, on) right rows: merge_asof keeps input order, so
    # the LAST input row wins backward and the FIRST wins forward —
    # exactly asof_join's right_order rule
    rsdf = right._sdf.withColumnRenamed(_RID, "__r_ord")
    payload = [c for c in rsdf.columns if c not in by and c != on]
    # group-less as-of: constant key keeps ONE partition — fine for the
    # veneer's small-data contract, use `by` for distributed runs
    if not by:
        by = ["__asof_g"]
        lsdf = lsdf.withColumn("__asof_g", F.lit(1))
        rsdf = rsdf.withColumn("__asof_g", F.lit(1))
        dropped_by = True
    else:
        dropped_by = False
    out = asof_join(
        lsdf, rsdf, by=by, ts=on, payload=payload, suffix="__r",
        direction=direction, tolerance=tolerance,
        allow_exact_matches=allow_exact_matches, right_order=["__r_ord"],
    ).drop("__r_ord__r")
    payload = [c for c in payload if c != "__r_ord"]
    clash = {c for c in payload if c in lsdf.columns}
    for c in clash:
        out = out.withColumnRenamed(c, c + suffixes[0])
    for c in payload:
        out = out.withColumnRenamed(
            c + "__r", c + suffixes[1] if c in clash else c
        )
    if dropped_by:
        out = out.drop("__asof_g")
    return _DF(out)


def factorize(series) -> tuple:
    """cudf.factorize — (codes, uniques) like the Series method."""
    return series.factorize()


def to_numeric(col, errors: str = "raise"):
    """cudf.to_numeric (core/tools/numeric.py): string → double column;
    errors='coerce' maps unparseable to null (try_cast), 'raise' uses a
    plain cast (ANSI sessions raise, matching cuDF's error path)."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else (col.col if hasattr(col, "col") else col)
    if errors == "coerce":
        return F.try_cast(c, "double")
    return c.cast("double")


def isclose(a, b, rtol: float = 1e-05, atol: float = 1e-08):
    """cudf.isclose (numpy semantics): |a-b| <= atol + rtol*|b|,
    null-safe (null == null → true, null vs value → false)."""
    from pyspark.sql import functions as F

    ca = a.col if hasattr(a, "col") else a
    cb = b.col if hasattr(b, "col") else b
    close = F.abs(ca - cb) <= (F.lit(atol) + F.lit(rtol) * F.abs(cb))
    return F.when(ca.isNull() & cb.isNull(), F.lit(True)).otherwise(
        F.coalesce(close, F.lit(False))
    )


def merge_sorted(frames: list, key: str) -> "DataFrame":
    """cudf.merge_sorted (merge.hpp:52): union of pre-sorted frames,
    re-keyed to the merged order (distributed sort — at scale this is a
    range-partition shuffle, exactly how a k-way distributed merge is
    expressed declaratively)."""
    out = frames[0]
    for f in frames[1:]:
        out = out.append(f)
    return out.sort_values(key)


def read_avro(filepath, spark=None, **kwargs) -> "DataFrame":
    """cudf.read_avro (io/avro.py; jar-gated like sources.io)."""
    from pygdf_spark.sources import io

    return from_spark(io.read_avro(spark or get_spark(), filepath, **kwargs))


# numpy-style ufuncs (cudf re-exports these as module functions over
# columns; here each is the JVM expression, so ufunc call sites keep
# working and stay in whole-stage codegen)
def _col(x):
    return x.col if hasattr(x, "col") else x


def _ufunc1(fn):
    def u(x):
        return fn(_col(x))
    return u


def _ufunc2(fn):
    def u(a, b):
        from pyspark.sql import functions as F

        ca, cb = _col(a), _col(b)
        if not hasattr(cb, "cast"):
            cb = F.lit(cb)
        return fn(ca, cb)
    return u


def _init_ufuncs():
    from pyspark.sql import functions as F

    globals().update(
        sin=_ufunc1(F.sin), cos=_ufunc1(F.cos), tan=_ufunc1(F.tan),
        arcsin=_ufunc1(F.asin), arccos=_ufunc1(F.acos), arctan=_ufunc1(F.atan),
        exp=_ufunc1(F.exp), log=_ufunc1(F.log), sqrt=_ufunc1(F.sqrt),
        logical_not=_ufunc1(lambda c: ~c.cast("boolean")),
        add=_ufunc2(lambda a, b: a + b),
        subtract=_ufunc2(lambda a, b: a - b),
        multiply=_ufunc2(lambda a, b: a * b),
        true_divide=_ufunc2(lambda a, b: a / b),
        floor_divide=_ufunc2(lambda a, b: F.floor(a / b)),
        remainder=_ufunc2(lambda a, b: F.pmod(a, b)),
        logical_and=_ufunc2(lambda a, b: a.cast("boolean") & b.cast("boolean")),
        logical_or=_ufunc2(lambda a, b: a.cast("boolean") | b.cast("boolean")),
    )


_init_ufuncs()


class DateOffset:
    """cudf.DateOffset (core/tools/datetimes.py DateOffset): calendar
    offset applied to timestamp columns — months ride add_months (true
    calendrical arithmetic, datetime.hpp:188), sub-month units ride
    INTERVAL arithmetic."""

    def __init__(self, years: int = 0, months: int = 0, days: int = 0,
                 hours: int = 0, minutes: int = 0, seconds: int = 0):
        self.years, self.months, self.days = years, months, days
        self.hours, self.minutes, self.seconds = hours, minutes, seconds

    def apply(self, col):
        from pyspark.sql import functions as F

        # timestamp + make_interval does calendrical month arithmetic
        # AND preserves the time-of-day (add_months would return DATE)
        return _col(col) + F.make_interval(
            F.lit(self.years), F.lit(self.months), F.lit(0), F.lit(self.days),
            F.lit(self.hours), F.lit(self.minutes), F.lit(self.seconds),
        )

    def __radd__(self, col):
        return self.apply(col)


def register_dataframe_accessor(name: str):
    """cudf.api.extensions.register_dataframe_accessor — attach a custom
    namespace to the compat DataFrame (real implementation: a cached
    property on the veneer class)."""
    def deco(cls):
        setattr(DataFrame, name, property(lambda self: cls(self)))
        return cls
    return deco


def register_series_accessor(name: str):
    def deco(cls):
        setattr(Series, name, property(lambda self: cls(self)))
        return cls
    return deco


register_index_accessor = register_series_accessor  # positional index model


def set_allocator(*a, **k) -> None:
    """cudf.set_allocator — RMM pool configuration; memory here is
    executor/JVM-managed (spark.memory.*), so this is a documented
    no-op for call-site compatibility."""


def validate_setup() -> None:
    """cudf.utils.gpu_utils.validate_setup — GPU probe; the engine runs
    wherever a SparkSession can, so validation is a no-op."""


def get_versions() -> dict:
    import pyspark

    return {"version": __version__, "pyspark": pyspark.__version__}


class _SparkDtype:
    """Marker dtype classes (cudf.*Dtype): carry the Spark SQL type the
    veneer's astype() resolves."""

    def __init__(self, spark_type: str):
        self._t = spark_type

    def to_spark(self) -> str:
        return self._t

    def __str__(self) -> str:
        return self._t


class CategoricalDtype(_SparkDtype):
    """cudf.CategoricalDtype — no dictionary-encoded physical type in
    the engine; carries categories/ordered metadata, data stays in its
    natural type (label_encoding/factorize produce code views)."""

    def __init__(self, categories=None, ordered: bool = False):
        super().__init__("string")
        self.categories = list(categories) if categories is not None else None
        self.ordered = ordered


class ListDtype(_SparkDtype):
    def __init__(self, element_type: str = "string"):
        super().__init__(f"array<{element_type}>")


class StructDtype(_SparkDtype):
    def __init__(self, fields: dict):
        inner = ", ".join(f"{k}: {v}" for k, v in fields.items())
        super().__init__(f"struct<{inner}>")


class IntervalDtype(_SparkDtype):
    """IntervalDtype — struct of (left, right) edges (SURVEY.md §1.2)."""

    def __init__(self, subtype: str = "bigint"):
        super().__init__(f"struct<left: {subtype}, right: {subtype}>")


class Decimal32Dtype(_SparkDtype):
    MAX_PRECISION = 9

    def __init__(self, precision: int, scale: int = 0):
        super().__init__(f"decimal({precision},{scale})")


class Decimal64Dtype(_SparkDtype):
    MAX_PRECISION = 18

    def __init__(self, precision: int, scale: int = 0):
        super().__init__(f"decimal({precision},{scale})")


class Scalar:
    """cudf.Scalar — host scalar with an optional dtype; unwraps to a
    typed literal Column via .to_column() (device scalars have no analog
    here; reductions already return host values)."""

    def __init__(self, value, dtype: str | None = None):
        self.value = value
        self.dtype = dtype

    def to_column(self):
        from pyspark.sql import functions as F

        c = F.lit(self.value)
        return c.cast(str(self.dtype)) if self.dtype else c

    def __repr__(self) -> str:
        return f"Scalar({self.value!r}, dtype={self.dtype})"


class Grouper:
    """cudf.Grouper (pandas-style): named-key grouping spec accepted by
    DataFrame.groupby."""

    def __init__(self, key: str):
        self.key = key


def RangeIndex(start, stop=None, step: int = 1):
    """cudf.RangeIndex — the veneer's row identity IS a positional
    range, so RangeIndex constructs exactly builtins.range."""
    return range(start) if stop is None else range(start, stop, step)


class Index:
    """Minimal host-side Index (reference core/index.py BaseIndex
    surface) — an immutable labeled value sequence. The engine's row
    identity stays positional (the order column); this class exists so
    cudf-shaped code handling returned label sets (``unique()`` lists,
    ``cat.categories``, ``groupby`` key domains) keeps its Index-style
    surface: ``.values``/``.tolist()``, set algebra, membership, map.
    Distributed index semantics (``set_index``/``sort_index``) live on
    the frame, as documented."""

    def __init__(self, values, name: str | None = None):
        self._values = list(values)
        self.name = name

    # container surface
    def __iter__(self):
        return iter(self._values)

    def __len__(self) -> int:
        return len(self._values)

    def __getitem__(self, i):
        v = self._values[i]
        return Index(v, self.name) if isinstance(i, slice) else v

    def __contains__(self, v) -> bool:
        return v in self._values

    def __eq__(self, other) -> bool:
        return self._values == list(other)

    def __repr__(self) -> str:
        return f"{type(self).__name__}({self._values!r}, name={self.name!r})"

    @property
    def values(self) -> list:
        return list(self._values)

    def tolist(self) -> list:
        return list(self._values)

    to_list = tolist

    @property
    def is_unique(self) -> bool:
        return len(set(self._values)) == len(self._values)

    @property
    def size(self) -> int:
        return len(self._values)

    # label algebra (index.py union/intersection/difference surface)
    def _set_op(self, other, op) -> "Index":
        a, b = self._values, list(other)
        sb = set(b)
        if op == "union":
            sa = set(a)
            out = a + [v for v in dict.fromkeys(b) if v not in sa]
        elif op == "intersection":
            out = [v for v in dict.fromkeys(a) if v in sb]
        else:
            out = [v for v in dict.fromkeys(a) if v not in sb]
        return Index(out, self.name)

    def union(self, other) -> "Index":
        return self._set_op(other, "union")

    def intersection(self, other) -> "Index":
        return self._set_op(other, "intersection")

    def difference(self, other) -> "Index":
        return self._set_op(other, "difference")

    def unique(self) -> "Index":
        return Index(dict.fromkeys(self._values), self.name)

    def get_loc(self, v) -> int:
        return self._values.index(v)

    def isin(self, values) -> list:
        s = set(values)
        return [v in s for v in self._values]

    def map(self, fn) -> "Index":
        return Index([fn(v) for v in self._values], self.name)

    def rename(self, name: str) -> "Index":
        return Index(self._values, name)


# MultiIndex: real minimal implementation (column-label half) — the row
# half keeps the group-keys-stay-columns convention.
from pygdf_spark.core.multiindex import MultiIndex  # noqa: E402,F401

# Typed index family (index.py:2758 region): host-side label sequences.
# Values are plain Python objects — the "type" is documentation + the
# reference import surface; distributed columns stay Spark-typed.
BaseIndex = Index
for _n in ("Int8Index", "Int16Index", "Int32Index", "Int64Index",
           "UInt8Index", "UInt16Index", "UInt32Index", "UInt64Index",
           "Float32Index", "Float64Index", "CategoricalIndex",
           "DatetimeIndex", "TimedeltaIndex"):
    globals()[_n] = type(_n, (Index,), {})


# cudf.api parity namespace — imported at the END of module init because
# api.extensions re-exports the accessor registrars defined above (a
# top-of-module import would hit the partially-initialized package).
from pygdf_spark import api  # noqa: E402,F401


class IntervalIndex(Index):
    """IntervalIndex (index.py:2758): (left, right) edge tuples with
    half-open/closed containment — the host-side companion of the
    distributed `interval_contains` query."""

    def __init__(self, tuples, closed: str = "right", name: str | None = None):
        super().__init__([tuple(t) for t in tuples], name)
        self.closed = closed

    @classmethod
    def from_breaks(cls, breaks, closed: str = "right", name=None) -> "IntervalIndex":
        return cls(list(zip(breaks[:-1], breaks[1:])), closed, name)

    def contains_value(self, v) -> list:
        lo = (lambda left: v >= left) if self.closed in ("left", "both") else (lambda left: v > left)
        hi = (lambda right: v <= right) if self.closed in ("right", "both") else (lambda right: v < right)
        return [lo(left) and hi(right) for left, right in self._values]
