"""cuDF-compatible Series veneer (core/series.py:66) + the ``.str``
(core/column/string.py) and ``.dt`` (series.py:6080-6397) accessors.

A Series is a named column bound to its parent wrapper — operations
either return Spark ``Column`` expressions (composable, lazy) or, for
reductions, host scalars (cuDF returns host scalars from reductions
too: ``Series.sum`` et al., series.py:4110+). ``value_counts``/
``unique`` return frames/lists since they change cardinality.

The ``.str`` accessor delegates to ``pygdf_spark.functions.strings`` —
every method is a JVM-side expression (no Python row loop), so a
``s.str.lower().contains(...)`` chain compiles into the same
whole-stage-codegen span as hand-written SQL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from pygdf_spark.functions import strings as _str


class StrAccessor:
    """cuDF .str accessor over a column expression."""

    def __init__(self, col: Column):
        self._c = col

    def __getattr__(self, name: str):
        fn = getattr(_str, name, None) or getattr(_str, name + "_", None)
        if fn is None:
            raise AttributeError(f".str has no method {name!r}")

        def bound(*args, **kwargs):
            return fn(self._c, *args, **kwargs)

        return bound


class ListAccessor:
    """cuDF .list accessor (core/column/lists.py) over an ArrayType
    column — every method is a JVM-side array expression."""

    def __init__(self, col: Column):
        self._c = col

    def get(self, i: int) -> Column:
        """lists.py:293 (extract.hpp:63) — element at 0-based index;
        negative indexes from the end, as cuDF."""
        return F.element_at(self._c, i + 1 if i >= 0 else i)

    def contains(self, value) -> Column:
        """lists.py:325 (contains.hpp:48)."""
        return F.array_contains(self._c, value)

    def leaves(self) -> Column:
        """lists.py:365 — flatten one nesting level."""
        return F.flatten(self._c)

    def len(self) -> Column:
        """lists.py:393 (count_elements.hpp:49)."""
        return F.size(self._c)

    def take(self, indices) -> Column:
        """lists.py:417 (gather.hpp:56) — gather per-row by a 0-based
        index array (a Column or a literal list)."""
        idx = F.array(*[F.lit(i) for i in indices]) if isinstance(indices, list) else indices
        c = self._c
        return F.transform(
            idx, lambda i: F.element_at(c, F.when(i >= 0, i + 1).otherwise(i))
        )

    def unique(self) -> Column:
        """lists.py:472 (drop_list_duplicates.hpp:58)."""
        return F.array_distinct(self._c)

    def sort_values(self, ascending: bool = True) -> Column:
        """lists.py:507 (lists/sorting.hpp:51)."""
        return F.sort_array(self._c, asc=ascending)

    def concat(self, other) -> Column:
        """lists.py:561 (combine.hpp:61) — per-row list concatenation."""
        return F.concat(self._c, other)


class StructAccessor:
    """cuDF .struct accessor (core/column/struct.py)."""

    def __init__(self, col: Column):
        self._c = col

    def field(self, name: str) -> Column:
        return self._c.getField(name)

    def explode(self):
        """struct.py explode — one column per field; returns the list of
        field Columns (the DataFrame veneer selects them)."""
        return self._c


class DtAccessor:
    """cuDF .dt accessor (series.py:6080-6397; datetime.hpp:45-205)."""

    def __init__(self, col: Column):
        self._c = col

    @property
    def year(self) -> Column:
        return F.year(self._c)

    @property
    def month(self) -> Column:
        return F.month(self._c)

    @property
    def day(self) -> Column:
        return F.dayofmonth(self._c)

    @property
    def hour(self) -> Column:
        return F.hour(self._c)

    @property
    def minute(self) -> Column:
        return F.minute(self._c)

    @property
    def second(self) -> Column:
        return F.second(self._c)

    @property
    def weekday(self) -> Column:
        # cuDF weekday: Monday=0 (pandas semantics); Spark dayofweek: Sunday=1
        return (F.dayofweek(self._c) + 5) % 7

    @property
    def dayofyear(self) -> Column:
        return F.dayofyear(self._c)

    @property
    def is_leap_year(self) -> Column:
        y = F.year(self._c)
        return ((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0)

    def strftime(self, fmt: str) -> Column:
        # translate the common strftime directives to Spark's pattern
        pat = (
            fmt.replace("%Y", "yyyy").replace("%m", "MM").replace("%d", "dd")
            .replace("%H", "HH").replace("%M", "mm").replace("%S", "ss")
        )
        return F.date_format(self._c, pat)

    # -- timedelta components (series.py:6563-6694) ----------------------
    # The engine encodes DURATION_* as microseconds in a long column
    # (SURVEY.md §1.2: DURATION_NANO truncates to µs). Components follow
    # pandas: floor-division decomposition, negative durations floor
    # toward -inf.

    @property
    def days(self) -> Column:
        return F.floor(self._c / F.lit(86_400_000_000)).cast("long")

    @property
    def seconds(self) -> Column:
        return F.pmod(F.floor(self._c / F.lit(1_000_000)), F.lit(86_400)).cast("long")

    @property
    def microseconds(self) -> Column:
        return F.pmod(self._c, F.lit(1_000_000)).cast("long")

    @property
    def nanoseconds(self) -> Column:
        # µs resolution: the sub-microsecond remainder is always 0
        return F.lit(0).cast("long")

    def total_seconds(self) -> Column:
        return (self._c / F.lit(1_000_000)).cast("double")


class Series:
    """Single named column of a core.DataFrame (series.py:66)."""

    def __init__(self, parent, name: str):
        self._parent = parent
        self._name = name

    @property
    def col(self) -> Column:
        return F.col(self._name)

    # arithmetic/comparison dunders delegate to the Column expression so
    # ``df["x"] + 1`` / ``df[df["x"] > 3]`` read like cuDF call sites
    def _other(self, other):
        return other.col if isinstance(other, Series) else other

    def __add__(self, o):
        return self.col + self._other(o)

    def __sub__(self, o):
        return self.col - self._other(o)

    def __mul__(self, o):
        return self.col * self._other(o)

    def __truediv__(self, o):
        return self.col / self._other(o)

    def __mod__(self, o):
        return self.col % self._other(o)

    def __gt__(self, o):
        return self.col > self._other(o)

    def __ge__(self, o):
        return self.col >= self._other(o)

    def __lt__(self, o):
        return self.col < self._other(o)

    def __le__(self, o):
        return self.col <= self._other(o)

    def __eq__(self, o):  # noqa: D105 - expression, not identity (pandas-style)
        return self.col == self._other(o)

    def __ne__(self, o):
        return self.col != self._other(o)

    __hash__ = None

    def isin(self, values) -> Column:
        return self.col.isin(list(values))

    def isnull(self) -> Column:
        return self.col.isNull()

    def notnull(self) -> Column:
        return self.col.isNotNull()

    def astype(self, t: str) -> Column:
        return self.col.cast(t)

    def fillna(self, v) -> Column:
        return F.coalesce(self.col, F.lit(v))

    def map(self, mapping: dict) -> Column:
        """Series.map with a dict (series.py:934) — a literal MapType
        lookup, evaluated JVM-side (unmapped values → null, as cuDF)."""
        pairs = [x for kv in mapping.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
        return F.element_at(F.create_map(*pairs), self.col)

    @property
    def str(self) -> StrAccessor:
        return StrAccessor(self.col)

    @property
    def dt(self) -> DtAccessor:
        return DtAccessor(self.col)

    @property
    def list(self) -> ListAccessor:
        return ListAccessor(self.col)

    @property
    def struct(self) -> StructAccessor:
        return StructAccessor(self.col)

    # -- reductions (host scalars, series.py:4110+) ----------------------

    def _agg(self, expr):
        return self._parent._sdf.agg(expr.alias("v")).collect()[0]["v"]

    @property
    def _ncol(self) -> Column:
        """Missing-safe column for reductions: NaN (the pandas-interop
        encoding of missing in float columns) → null, so aggregates
        skip it like pandas/cuDF reductions do."""
        t = dict(self._parent._sdf.dtypes).get(self._name)
        return F.when(~F.isnan(self.col), self.col) if t in ("double", "float") else self.col

    def sum(self):
        return self._agg(F.sum(self._ncol))

    def mean(self):
        return self._agg(F.avg(self._ncol))

    def min(self):
        return self._agg(F.min(self._ncol))

    def max(self):
        return self._agg(F.max(self._ncol))

    def count(self):
        return self._agg(F.count(self._ncol))

    def nunique(self):
        return self._agg(F.countDistinct(self._ncol))

    def any(self):
        return bool(self._agg(F.bool_or(self.col.cast("boolean"))))

    def all(self):
        return bool(self._agg(F.bool_and(self.col.cast("boolean"))))

    def std(self):
        return self._agg(F.stddev_samp(self._ncol))

    def var(self):
        return self._agg(F.var_samp(self._ncol))

    def median(self):
        return self._agg(F.median(self._ncol))

    def quantile(self, q: float):
        """quantile (series reductions; group analog groupby.py:752) —
        exact linear-interpolation percentile, pandas default."""
        return self._agg(F.percentile(self._ncol, F.lit(q)))

    def skew(self):
        """skew with pandas/cuDF sample adjustment (dataframe.py method
        list): Spark's skewness is the population g1; pandas reports
        G1 = g1 * sqrt(n(n-1)) / (n-2)."""
        row = self._parent._sdf.agg(
            F.skewness(self._ncol).alias("g1"), F.count(self._ncol).alias("n")
        ).collect()[0]
        g1, n = row["g1"], row["n"]
        if g1 is None or n < 3:
            return None
        return g1 * (n * (n - 1)) ** 0.5 / (n - 2)

    def kurtosis(self):
        """kurtosis with pandas/cuDF sample adjustment (series
        reductions): Spark's kurtosis is population excess g2; pandas
        reports G2 = ((n+1)·g2 + 6)·(n-1)/((n-2)(n-3))."""
        row = self._parent._sdf.agg(
            F.kurtosis(self._ncol).alias("g2"), F.count(self._ncol).alias("n")
        ).collect()[0]
        g2, n = row["g2"], row["n"]
        if g2 is None or n < 4:
            return None
        return ((n + 1) * g2 + 6) * (n - 1) / ((n - 2) * (n - 3))

    def corr(self, other):
        """Series.corr (series.py:4933) — Pearson correlation with
        another column of the same frame."""
        oc = F.col(other if isinstance(other, str) else other._name)
        return self._agg(F.corr(self._ncol, oc))

    def cov(self, other):
        """Series.cov (series.py:4890) — sample covariance."""
        oc = F.col(other if isinstance(other, str) else other._name)
        return self._agg(F.covar_samp(self._ncol, oc))

    def prod(self):
        """Series.product (reductions product.cu)."""
        return self._agg(F.product(self._ncol))

    def mode(self):
        """Series.mode (series.py:4690) — the most frequent value;
        smallest value on ties (pandas returns the sorted mode list —
        this is its head)."""
        row = (
            self._parent._sdf.groupBy(self._ncol.alias("v"))
            .count()
            .orderBy(F.col("count").desc(), F.col("v").asc())
            .limit(1)
            .collect()
        )
        return row[0]["v"] if row else None

    # -- order-sensitive (ride the parent's row-order column) ------------

    def shift(self, periods: int = 1) -> "Series":
        """Series.shift (frame.py:1644) over the parent's row order."""
        out = self._parent.shift(self._name, periods)
        return Series(out, f"{self._name}_shift")

    def diff(self) -> "Series":
        """Series.diff (series.py:5652)."""
        out = self._parent.diff(self._name)
        return Series(out, f"{self._name}_diff")

    def cumsum(self) -> "Series":
        """Series.cumsum (reduction.hpp:90 scan)."""
        out = self._parent.cumsum(self._name)
        return Series(out, f"{self._name}_cumsum")

    def to_pandas(self):
        """Host round-trip of this column, in row order (small-data)."""
        return self._parent.to_pandas()[self._name]

    # -- cardinality-changing (series.py:5023,5091) ----------------------

    def unique(self) -> list:
        rows = self._parent._sdf.select(self.col).distinct().collect()
        return sorted((r[0] for r in rows), key=lambda v: (v is None, v))

    def value_counts(self):
        """value_counts (series.py:5091) as a core.DataFrame."""
        from pygdf_spark.core.dataframe import DataFrame

        out = (
            self._parent._sdf.groupBy(self.col.alias(self._name))
            .agg(F.count(F.lit(1)).alias("count"))
            .orderBy(F.col("count").desc(), F.col(self._name).asc_nulls_last())
        )
        return DataFrame(out)
