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

    @staticmethod
    def _n_to_limit(n: int) -> int:
        """pandas/cuDF ``n`` = max number of SPLITS (n splits → n+1
        pieces; n ≤ 0 means all), Spark's split ``limit`` = max PIECE
        count. ``s.str.rsplit(' ', 2)`` on 'a b c' must give
        ['a','b','c'], not ['a b','c']."""
        return n + 1 if n > 0 else -1

    def split(self, pat: str | None = None, n: int = -1, regex: bool = False, **_kw) -> Column:
        """pandas/cuDF semantics: pat=None → whitespace; an explicit
        pat is a LITERAL separator unless regex=True ('a.b'.split('.')
        must give ['a','b'], not per-char empties)."""
        import re as _re

        import pyspark.sql.functions as _F

        if pat is None:
            # Python str.split(None): strip ends, split on runs
            return _str.split(_F.trim(self._c), r"\s+", self._n_to_limit(n))
        return _str.split(self._c, pat if regex else _re.escape(pat), self._n_to_limit(n))

    def rsplit(self, pat: str | None = None, n: int = -1, **_kw) -> Column:
        """pat=None → whitespace, matching pandas (the functions-layer
        rsplit always treats its separator as a literal)."""
        if pat is None:
            # whitespace rsplit: normalize runs to single spaces first
            # (pandas' None-pat split family collapses whitespace), then
            # right-split on the literal space
            import pyspark.sql.functions as _F

            norm = _F.regexp_replace(_F.trim(self._c), r"\s+", " ")
            return _str.rsplit(norm, " ", self._n_to_limit(n))
        return _str.rsplit(self._c, pat, self._n_to_limit(n))

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


class CatAccessor:
    """cuDF CategoricalAccessor (core/column/categorical.py:56,
    core/dtypes.py:29) over the engine's dictionary-as-dim-table
    convention: the column stays a plain value column; the category
    list (the "dictionary") is a bounded, sorted domain and the codes
    are positions in it.

    A categorical dtype is by definition low-cardinality, so the
    category list materializes driver-side — guarded by
    ``MAX_CATEGORIES`` so a 100 TB user can't silently funnel a
    billion-value domain through the driver (use
    ``factorize``/``label_encoding``'s distributed code views for
    unbounded domains).

    Methods that change the dictionary (``add/remove/set/
    reorder_categories``, ``as_ordered``) return a NEW accessor
    carrying the updated dictionary; ``column`` exposes the (possibly
    re-nulled) value expression and ``codes`` the position expression
    for assignment back into a frame.
    """

    MAX_CATEGORIES = 65536

    def __init__(self, series, categories: list | None = None, ordered: bool = False):
        self._s = series
        self._explicit = categories
        self._ordered = ordered
        self._derived_cache: list | None = None

    # -- dictionary ----------------------------------------------------
    def _derived(self) -> list:
        name = self._s._name
        sdf = self._s._parent._sdf
        rows = (
            sdf.select(name).where(F.col(name).isNotNull()).distinct()
            .limit(self.MAX_CATEGORIES + 1).collect()
        )
        if len(rows) > self.MAX_CATEGORIES:
            raise ValueError(
                f".cat: column {name!r} has more than {self.MAX_CATEGORIES} "
                "distinct values — not a categorical domain; use "
                "factorize()/label_encoding() for distributed code views"
            )
        return sorted(r[0] for r in rows)

    @property
    def categories(self) -> list:
        if self._explicit is not None:
            return list(self._explicit)
        if self._derived_cache is None:  # memoized: one distinct scan per accessor
            self._derived_cache = self._derived()
        return list(self._derived_cache)

    @property
    def ordered(self) -> bool:
        return self._ordered

    # -- views ---------------------------------------------------------
    @property
    def column(self) -> Column:
        """The value column with out-of-dictionary values nulled (the
        decategorize-safe view)."""
        c = self._s.col
        if self._explicit is None:
            return c
        return F.when(c.isin(list(self._explicit)), c)

    @property
    def codes(self) -> Column:
        """Position of each value in the category list; −1 for nulls
        and out-of-dictionary values (pandas sentinel)."""
        cats = self.categories
        c = self._s.col
        arr = F.array(*[F.lit(v) for v in cats])
        # array_position is 1-based and 0 when absent → subtract 1
        return (F.coalesce(F.array_position(arr, c), F.lit(0)) - 1).cast("int")

    # -- dictionary edits (each returns a new accessor) ----------------
    def as_ordered(self) -> "CatAccessor":
        # `or` would treat an explicitly-set EMPTY dictionary as unset
        return CatAccessor(self._s, self.categories, True)

    def as_unordered(self) -> "CatAccessor":
        return CatAccessor(self._s, self.categories, False)

    def add_categories(self, new) -> "CatAccessor":
        new = [new] if not isinstance(new, (list, tuple)) else list(new)
        cats = self.categories
        dup = set(new) & set(cats)
        if dup:
            raise ValueError(f"new categories must not include old categories: {sorted(dup)}")
        return CatAccessor(self._s, cats + new, self._ordered)

    def remove_categories(self, removals) -> "CatAccessor":
        removals = [removals] if not isinstance(removals, (list, tuple)) else list(removals)
        cats = self.categories
        missing = set(removals) - set(cats)
        if missing:
            raise ValueError(f"removals must all be in old categories: {sorted(missing)}")
        return CatAccessor(self._s, [c for c in cats if c not in set(removals)], self._ordered)

    def set_categories(self, new, ordered: bool = False) -> "CatAccessor":
        return CatAccessor(self._s, list(new), ordered)

    def reorder_categories(self, new, ordered: bool = False) -> "CatAccessor":
        if set(new) != set(self.categories):
            raise ValueError(
                "items in new_categories are not the same as in old categories"
            )
        return CatAccessor(self._s, list(new), ordered)


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

    #: cuDF/pandas spelling aliases (series.py dayofweek/day_of_year)
    dayofweek = weekday
    day_of_week = weekday
    day_of_year = dayofyear

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

    @property
    def components(self) -> Column:
        """components (series.py:6563): the full floor-division
        decomposition as one struct column (pandas field ranges:
        hours 0-23, minutes/seconds 0-59, ms 0-999, µs 0-999) — cuDF
        returns a frame of the same fields; select
        ``col.components.*`` to flatten."""
        c = self._c
        return F.struct(
            self.days.alias("days"),
            F.pmod(F.floor(c / F.lit(3_600_000_000)), F.lit(24)).cast("long").alias("hours"),
            F.pmod(F.floor(c / F.lit(60_000_000)), F.lit(60)).cast("long").alias("minutes"),
            F.pmod(F.floor(c / F.lit(1_000_000)), F.lit(60)).cast("long").alias("seconds"),
            F.floor(F.pmod(c, F.lit(1_000_000)) / F.lit(1000)).cast("long").alias("milliseconds"),
            F.pmod(c, F.lit(1000)).cast("long").alias("microseconds"),
            self.nanoseconds.alias("nanoseconds"),
        )


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

    def astype(self, t) -> Column:
        # 'category' / CategoricalDtype: dictionary-as-dim-table — the
        # values column IS the categorical; .cat derives the dictionary
        if t == "category" or type(t).__name__ == "CategoricalDtype":
            return self.col
        t = t.to_spark() if hasattr(t, "to_spark") else t
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
        from pygdf_spark.options import check_driver_rows

        distinct = self._parent._sdf.select(self.col).distinct()
        check_driver_rows(distinct, "Series.unique")
        return sorted((r[0] for r in distinct.collect()), key=lambda v: (v is None, v))

    def value_counts(self, dropna: bool = True):
        """value_counts (series.py:5091) as a core.DataFrame; excludes
        nulls by default (dropna=True, the reference default)."""
        from pygdf_spark.core.dataframe import DataFrame

        sdf = self._parent._sdf
        if dropna:
            sdf = sdf.filter(self.col.isNotNull())
        out = (
            sdf.groupBy(self.col.alias(self._name))
            .agg(F.count(F.lit(1)).alias("count"))
            .orderBy(F.col("count").desc(), F.col(self._name).asc_nulls_last())
        )
        return DataFrame(out)

    # -- named binary ops (series.py binaryop surface) -------------------

    def add(self, o):
        """named arithmetic (series.py add/radd/…): same expressions as
        the dunders, for call-site parity with cuDF."""
        return self.col + self._other(o)

    def sub(self, o):
        return self.col - self._other(o)

    subtract = sub

    def mul(self, o):
        return self.col * self._other(o)

    multiply = mul

    def truediv(self, o):
        return self.col / self._other(o)

    def floordiv(self, o):
        return F.floor(self.col / self._other(o))

    def mod(self, o):
        return F.pmod(self.col, F.lit(self._other(o)))

    remainder = mod

    def pow(self, o):
        return F.pow(self.col, self._other(o))

    def radd(self, o):
        return self.col + self._other(o)

    def rsub(self, o):
        return F.lit(self._other(o)) - self.col

    def rmul(self, o):
        return self.col * self._other(o)

    def rtruediv(self, o):
        return F.lit(self._other(o)) / self.col

    def rfloordiv(self, o):
        return F.floor(F.lit(self._other(o)) / self.col)

    def rmod(self, o):
        return F.pmod(F.lit(self._other(o)), self.col)

    def rpow(self, o):
        return F.pow(F.lit(self._other(o)), self.col)

    def eq(self, o):
        """named comparisons (series.py eq/ne/lt/…)."""
        return self.col == self._other(o)

    def ne(self, o):
        return self.col != self._other(o)

    def lt(self, o):
        return self.col < self._other(o)

    def le(self, o):
        return self.col <= self._other(o)

    def gt(self, o):
        return self.col > self._other(o)

    def ge(self, o):
        return self.col >= self._other(o)

    def logical_and(self, o):
        """logical_and/or/not (series.py:3118-3190)."""
        return self.col.cast("boolean") & self._other(o)

    def logical_or(self, o):
        return self.col.cast("boolean") | self._other(o)

    def logical_not(self):
        return ~self.col.cast("boolean")

    # -- numpy ufunc interop (cudf test_array_ufunc.py: np.sin(series)
    # etc. dispatch to the GPU; here every ufunc lowers to the
    # equivalent JVM Column expression — no numpy evaluation, no
    # collect; the result composes into the same lazy plan) -----------

    def __array_ufunc__(self, ufunc, method, *inputs, **kwargs):
        return _ufunc_dispatch(ufunc, method, inputs, kwargs)

    # -- unary math (unary.hpp; series applymap-free fast path) ----------

    def abs(self):
        return F.abs(self.col)

    def round(self, decimals: int = 0):
        """HALF_EVEN like pandas/cuDF round (round.hpp:70)."""
        return F.bround(self.col, decimals)

    def floor(self):
        return F.floor(self.col)

    def ceil(self):
        return F.ceil(self.col)

    def exp(self):
        return F.exp(self.col)

    def log(self):
        return F.log(self.col)

    def sqrt(self):
        return F.sqrt(self.col)

    def sin(self):
        return F.sin(self.col)

    def cos(self):
        return F.cos(self.col)

    def tan(self):
        return F.tan(self.col)

    def asin(self):
        return F.asin(self.col)

    def acos(self):
        return F.acos(self.col)

    def atan(self):
        return F.atan(self.col)

    def clip(self, lower, upper):
        """clip (replace.hpp:202)."""
        return F.greatest(F.lit(lower), F.least(F.lit(upper), self.col))

    def where(self, cond, other=None):
        """where (copy_if_else copying.hpp:705)."""
        return F.when(self._other(cond), self.col).otherwise(F.lit(other))

    def mask(self, cond, other=None):
        return F.when(self._other(cond), F.lit(other)).otherwise(self.col)

    def between(self, left, right, inclusive: str = "both"):
        lo = self.col >= left if inclusive in ("both", "left") else self.col > left
        hi = self.col <= right if inclusive in ("both", "right") else self.col < right
        return lo & hi

    def hash_values(self, method: str = "murmur3"):
        """hash_values (series.py:5336, hashing.hpp:39)."""
        if method == "md5":
            return F.md5(self.col.cast("string"))
        if method == "xxhash64":
            return F.xxhash64(self.col)
        return F.hash(self.col)

    def digitize(self, bins: list, right: bool = False):
        """digitize (series.py:2800, numpy semantics): index of the bin
        each value falls in — a fold over the literal bin edges, all
        JVM-side."""
        c = self.col
        arr = F.array(*[F.lit(b) for b in bins])
        hit = (lambda b: (c <= b).cast("int")) if right else (lambda b: (c < b).cast("int"))
        return (F.lit(len(bins)) - F.aggregate(
            arr, F.lit(0), lambda acc, b: acc + hit(b))).cast("long")

    def scale(self):
        """scale (series.py:4430): (x − min)/(max − min) to [0, 1].
        min/max come from ONE distributed aggregate (partial/final
        combine; a single 2-scalar row reaches the driver, like the
        order primitives' boundary sample) and fold in as literals —
        never an unpartitioned window over the data. Eager like the
        reference: the upstream plan runs once at expression build."""
        row = self._parent._sdf.agg(
            F.min(self.col).alias("mn"), F.max(self.col).alias("mx")
        ).first()
        mn, mx = row["mn"], row["mx"]
        if mn is not None and mn == mx:
            # constant (or single-row) column: cuDF's float division
            # gives 0/0 = NaN; Spark non-ANSI division would yield null
            return F.lit(float("nan")).cast("double")
        return (self.col - F.lit(mn)) / (F.lit(mx) - F.lit(mn))

    def applymap(self, func, out_type: str = "double"):
        """applymap (series.py:2260 → numba CUDA kernel): elementwise
        Python over Arrow batches (pandas_udf) — the documented slow
        path, same contract as the reference's JIT'd kernel."""
        from pyspark.sql.functions import pandas_udf

        @pandas_udf(out_type)
        def _k(s):
            return s.map(func)

        return _k(self.col)

    def nans_to_nulls(self):
        """nans_to_nulls (series.py:4960)."""
        return F.when(~F.isnan(self.col), self.col)

    # -- delegating frame ops (project this column, keep row order) ------

    def _frame(self):
        return self._parent[[self._name]]

    def to_frame(self):
        """to_frame (series.py:735)."""
        return self._frame()

    def copy(self):
        return Series(self._parent.copy(), self._name)

    def rename(self, name: str):
        """rename (series.py:1220) — new name, same expression."""
        return Series(self._parent.assign(**{name: self.col}), name)

    def head(self, n: int = 5):
        return self._frame().head(n)

    def tail(self, n: int = 5):
        return self._frame().tail(n)

    def sort_values(self, ascending: bool = True):
        return self._frame().sort_values(self._name, ascending=ascending)

    def sort_index(self, ascending: bool = True):
        return self._frame().sort_index(ascending=ascending)

    def reverse(self):
        """reverse (series.py:2330)."""
        return self._frame().reverse()

    def drop_duplicates(self, keep: str = "first"):
        return self._frame().drop_duplicates(keep=keep)

    def dropna(self):
        return self._frame().dropna()

    def nlargest(self, n: int = 5):
        return self._frame().nlargest(n, self._name)

    def nsmallest(self, n: int = 5):
        return self._frame().nsmallest(n, self._name)

    def rank(self, method: str = "min", ascending: bool = True):
        return self._frame().rank(self._name, method=method, ascending=ascending)

    def rolling(self, window: int, min_periods: int | None = None):
        return self._frame().rolling(window, min_periods)

    def explode(self):
        return self._frame().explode(self._name)

    def factorize(self):
        return self._parent.factorize(self._name)

    def describe(self):
        return self._frame().describe()

    def groupby(self, by):
        return self._parent.groupby(by)

    def take(self, indices: list[int]):
        return self._frame().take(indices)

    def sample(self, frac: float, seed: int = 0):
        return self._frame().sample(frac, seed)

    def repeat(self, repeats: int):
        return self._frame().repeat(repeats)

    def tile(self, count: int):
        return self._frame().tile(count)

    def searchsorted(self, values: list, side: str = "left"):
        return self._frame().searchsorted(self._name, values, side=side)

    def one_hot_encoding(self, cats: list, prefix: str | None = None):
        return self._parent.one_hot_encoding(self._name, prefix or self._name, cats)

    def label_encoding(self, cats: list, dtype: str = "int"):
        return self._parent.label_encoding(self._name, cats, dtype)

    def cummax(self) -> "Series":
        out = self._parent.cummax(self._name)
        return Series(out, f"{self._name}_cummax")

    def cummin(self) -> "Series":
        out = self._parent.cummin(self._name)
        return Series(out, f"{self._name}_cummin")

    def cumprod(self) -> "Series":
        out = self._parent.cumprod(self._name)
        return Series(out, f"{self._name}_cumprod")

    # -- host materialization / metadata ---------------------------------

    @property
    def values(self):
        """values (host numpy, small-data)."""
        return self.to_pandas().values

    def tolist(self) -> list:
        return self.to_pandas().tolist()

    to_array = tolist

    def to_dict(self) -> dict:
        return dict(enumerate(self.tolist()))

    @property
    def name(self) -> str:
        return self._name

    @property
    def dtype(self) -> str:
        return dict(self._parent._sdf.dtypes)[self._name]

    @property
    def ndim(self) -> int:
        return 1

    @property
    def shape(self) -> tuple[int]:
        return (len(self._parent),)

    @property
    def size(self) -> int:
        return len(self._parent)

    @property
    def empty(self) -> bool:
        return self._parent.empty

    @property
    def null_count(self) -> int:
        """null_count (series.py property; null_mask.hpp)."""
        return self._agg(F.sum(self.col.isNull().cast("long"))) or 0

    @property
    def has_nulls(self) -> bool:
        return self.null_count > 0

    @property
    def valid_count(self) -> int:
        return self._agg(F.count(self.col))

    @property
    def is_unique(self) -> bool:
        return self._agg(F.count(self.col)) == self._agg(F.countDistinct(self.col))

    @property
    def is_monotonic_increasing(self) -> bool:
        """is_monotonic (series.py property) — one windowed pass."""
        return self._monotonic(True)

    @property
    def is_monotonic_decreasing(self) -> bool:
        return self._monotonic(False)

    @property
    def is_monotonic(self) -> bool:
        return self.is_monotonic_increasing

    def _monotonic(self, increasing: bool) -> bool:
        from pygdf_spark.core.dataframe import _RID
        from pygdf_spark.operators.order import is_monotonic_dist

        return is_monotonic_dist(
            self._parent._sdf, _RID, self.col, increasing
        )

    def sum_of_squares(self):
        """sum_of_squares (reductions sum_of_squares.cu)."""
        return self._agg(F.sum(self._ncol * self._ncol))

    def equals(self, other: "Series") -> bool:
        return self._frame().rename(
            columns={self._name: "v"}
        ).equals(other._frame().rename(columns={other._name: "v"}))

    def pipe(self, func, *args, **kwargs):
        return func(self, *args, **kwargs)


def _extend_series_aliases():
    """Alias / interop parity batch for Series (alternate spellings,
    host iteration, GPU-buffer stubs)."""

    Series.isna = Series.isnull
    Series.notna = Series.notnull
    Series.kurt = Series.kurtosis
    Series.product = Series.prod
    Series.to_list = Series.tolist
    Series.values_host = Series.values
    Series.fill = Series.fillna

    def items(self):
        for i, v in enumerate(self.tolist()):
            yield i, v

    def keys(self):
        return range(len(self._parent))

    @property
    def index(self):
        return range(len(self._parent))

    @property
    def iloc(self):
        return self._frame().iloc

    @property
    def loc(self):
        return self._frame().loc

    def drop(self, positions: list[int]):
        """drop (series.py:1120) — remove rows by position (the veneer's
        labels are positions)."""
        from pygdf_spark.core.dataframe import _RID, DataFrame
        from pygdf_spark.operators.order import global_row_number

        sdf = global_row_number(self._frame()._sdf, [_RID], "__pos",
                                boundaries=self._frame()._rid_bounds())
        keep = sdf.filter(
            ~(F.col("__pos") - 1).isin([int(p) for p in positions])
        ).drop("__pos")
        return DataFrame(keep)

    def replace(self, to_replace, value=None):
        """replace (series.py:2020) — value substitution, returns the
        projected frame with values replaced."""
        return self._frame().replace(to_replace, value, subset=[self._name])

    def reset_index(self, drop: bool = False):
        return self._frame().reset_index(drop=drop)

    def set_index(self, col: str):
        return self._parent.set_index(col)

    def memory_usage(self) -> int:
        return self._frame().memory_usage()

    def merge(self, other, on, how: str = "inner"):
        return self._frame().merge(other if not isinstance(other, Series)
                                   else other._frame(), on=on, how=how)

    def interleave_columns(self, other: "Series"):
        """series-level interleave (reshape.hpp:49) — self/other values
        alternating."""
        pair = self._parent.assign(__other=self._other(other))
        return pair[[self._name, "__other"]].interleave_columns(
            [self._name, "__other"], name=self._name
        )

    def scatter_by_map(self, map_col: str, nparts: int):
        return self._parent.scatter_by_map(map_col, nparts)

    def to_arrow(self):
        return self._frame().to_arrow()

    def to_json(self, **kwargs):
        return self.to_pandas().to_json(**kwargs)

    def to_string(self) -> str:
        return self.to_pandas().to_string()

    def update(self, other):
        """update (series.py:3450) — positional non-null overwrite."""
        return self._frame().update(
            other._frame().rename(columns={other._name: self._name})
            if isinstance(other, Series) else other
        )

    def as_mask(self):
        """as_mask (series.py:2890) — boolean validity/selection column."""
        return self.col.cast("boolean")

    def hash_encode(self, stop: int):
        """hash_encode (series.py:3850): murmur3 hash mod `stop` — the
        feature-hashing trick, all JVM-side."""
        return F.pmod(F.hash(self.col), F.lit(stop))

    def nullmask(self):
        """nullmask (series.py property) — the validity mask as a
        boolean column (True = valid), the engine-portable analog of
        cuDF's packed bitmask buffer."""
        return self.col.isNotNull()

    @property
    def nullable(self) -> bool:
        return self.has_nulls

    @property
    def data(self):
        raise NotImplementedError(
            "Series.data exposes the raw device buffer — out of scope for "
            "a JVM engine; use to_arrow()/values for host materialization"
        )

    @property
    def cat(self):
        """CategoricalAccessor (categorical.py:56) — dictionary-as-
        dim-table: categories/codes/add/remove/set/reorder/as_ordered
        over a bounded, driver-guarded domain."""
        return CatAccessor(self)

    def argsort(self, ascending: bool = True) -> list:
        return self._frame().argsort(self._name, ascending=ascending)

    def append(self, other: "Series"):
        """append (series.py:2550) — row concat of the projected
        frames."""
        return self._frame().append(
            other._frame().rename(columns={other._name: self._name})
        )

    def _gpu_only(name: str):
        def method(self, *a, **k):
            raise NotImplementedError(
                f"{name} exchanges raw GPU device buffers — out of scope "
                "for a JVM/Arrow engine; use to_arrow()/to_pandas()"
            )
        return method

    for _n in ("to_dlpack", "to_gpu_array", "serialize", "deserialize",
               "from_masked_array", "from_categorical"):
        setattr(Series, _n, _gpu_only(_n))

    Series.items = items
    Series.iteritems = items
    Series.keys = keys
    Series.index = index
    Series.iloc = iloc
    Series.loc = loc
    Series.drop = drop
    Series.replace = replace
    Series.reset_index = reset_index
    Series.set_index = set_index
    Series.memory_usage = memory_usage
    Series.merge = merge
    Series.interleave_columns = interleave_columns
    Series.scatter_by_map = scatter_by_map
    Series.to_arrow = to_arrow
    Series.to_json = to_json
    Series.to_string = to_string
    Series.update = update
    Series.as_mask = as_mask
    Series.hash_encode = hash_encode
    Series.nullmask = nullmask
    Series.nullable = nullable
    Series.data = data
    Series.cat = cat
    Series.argsort = argsort
    Series.append = append


_extend_series_aliases()


def _attach_series_constructors():
    from pygdf_spark.core.dataframe import from_arrow as _fa
    from pygdf_spark.core.dataframe import from_pandas as _fp

    def from_pandas(spark, ps):
        """cudf.Series.from_pandas analog (SparkSession first)."""
        df = _fp(spark, ps.to_frame(ps.name or "value"))
        return Series(df, ps.name or "value")

    def from_arrow(spark, arr, name: str = "value"):
        import pyarrow as pa

        df = _fa(spark, pa.table({name: arr}))
        return Series(df, name)

    def reindex(self, positions: list[int]):
        """reindex (series.py:1350) — positional gather."""
        return self._frame().take(positions)

    def as_index(self):
        """as_index (series.py:820): the veneer's index is positional —
        returns the position range."""
        return range(len(self._parent))

    def set_mask(self, *a, **k):
        raise NotImplementedError(
            "set_mask writes a packed device validity bitmask — out of "
            "scope for a JVM engine; use where()/mask() expressions"
        )

    def to_hdf(self, path: str, key: str = "series"):
        return self._frame().to_hdf(path, key=key)

    Series.from_pandas = staticmethod(from_pandas)
    Series.from_arrow = staticmethod(from_arrow)
    Series.reindex = reindex
    Series.as_index = as_index
    Series.set_mask = set_mask
    Series.to_hdf = to_hdf


_attach_series_constructors()


# numpy-ufunc → Spark Column lowering tables (module level so the
# Series dispatch stays a dict lookup). Semantics notes:
# - trunc: toward zero (numpy), so ceil for negatives;
# - remainder: sign follows the divisor (numpy/python %), which is
#   ((a % b) + b) % b over Spark's truncated %;
# - isfinite/isinf are double-only, like the cuDF originals.
_UFUNC_UNARY = {
    "sin": F.sin, "cos": F.cos, "tan": F.tan,
    "arcsin": F.asin, "arccos": F.acos, "arctan": F.atan,
    "sinh": F.sinh, "cosh": F.cosh, "tanh": F.tanh,
    "arcsinh": F.asinh, "arccosh": F.acosh, "arctanh": F.atanh,
    "exp": F.exp, "expm1": F.expm1, "exp2": lambda c: F.pow(F.lit(2.0), c),
    "log": F.log, "log2": F.log2, "log10": F.log10, "log1p": F.log1p,
    "sqrt": F.sqrt, "cbrt": F.cbrt,
    "absolute": F.abs, "fabs": lambda c: F.abs(c.cast("double")),
    "negative": lambda c: -c, "positive": lambda c: c,
    "sign": F.signum, "rint": F.rint,
    "floor": F.floor, "ceil": F.ceil,
    "trunc": lambda c: F.when(c < 0, F.ceil(c)).otherwise(F.floor(c)),
    "reciprocal": lambda c: F.lit(1.0) / c,
    "square": lambda c: c * c,
    "degrees": F.degrees, "radians": F.radians,
    "rad2deg": F.degrees, "deg2rad": F.radians,
    "isnan": F.isnan,
    "isinf": lambda c: c.isin(float("inf"), float("-inf")),
    "isfinite": lambda c: ~(F.isnan(c) | c.isin(float("inf"), float("-inf"))),
    "logical_not": lambda c: ~c.cast("boolean"),
    "invert": lambda c: F.bitwise_not(c),
}

_UFUNC_BINARY = {
    "add": lambda a, b: a + b,
    "subtract": lambda a, b: a - b,
    "multiply": lambda a, b: a * b,
    "divide": lambda a, b: a / b,
    "true_divide": lambda a, b: a / b,
    "floor_divide": lambda a, b: F.floor(a / b),
    "remainder": lambda a, b: ((a % b) + b) % b,
    "mod": lambda a, b: ((a % b) + b) % b,
    "fmod": lambda a, b: a % b,
    "power": F.pow, "float_power": lambda a, b: F.pow(a.cast("double") if isinstance(a, Column) else a, b),
    "arctan2": F.atan2, "hypot": F.hypot,
    # stable forms: max + log1p(exp(-|a-b|)) — naive log(exp+exp)
    # overflows to inf above ~709 where numpy returns ~max(a,b); the
    # a==b branch also keeps logaddexp(inf, inf) == inf (inf-inf is NaN)
    "logaddexp": lambda a, b: F.when(a == b, a + F.log(F.lit(2.0))).otherwise(
        F.greatest(a, b) + F.log1p(F.exp(-F.abs(a - b)))
    ),
    "logaddexp2": lambda a, b: F.when(a == b, a + F.lit(1.0)).otherwise(
        F.greatest(a, b) + F.log2(F.lit(1.0) + F.pow(F.lit(2.0), -F.abs(a - b)))
    ),
    "maximum": F.greatest, "minimum": F.least,
    "fmax": F.greatest, "fmin": F.least,
    "equal": lambda a, b: a == b, "not_equal": lambda a, b: a != b,
    "less": lambda a, b: a < b, "less_equal": lambda a, b: a <= b,
    "greater": lambda a, b: a > b, "greater_equal": lambda a, b: a >= b,
    "bitwise_and": lambda a, b: a.bitwiseAND(b),
    "bitwise_or": lambda a, b: a.bitwiseOR(b),
    "bitwise_xor": lambda a, b: a.bitwiseXOR(b),
    "logical_and": lambda a, b: a.cast("boolean") & b.cast("boolean"),
    "logical_or": lambda a, b: a.cast("boolean") | b.cast("boolean"),
    "logical_xor": lambda a, b: a.cast("boolean") != b.cast("boolean"),
    "copysign": lambda a, b: F.when(b < 0, -F.abs(a)).otherwise(F.abs(a)),
}


def _ufunc_dispatch(ufunc, method, inputs, kwargs):
    """Shared numpy-ufunc → Column lowering for Series AND Column (the
    latter so chained calls like np.sqrt(np.absolute(s)) — whose inner
    result is a raw Column — keep dispatching)."""
    if method != "__call__" or kwargs.get("out") is not None:
        return NotImplemented
    name = ufunc.__name__

    def to_col(v):
        if isinstance(v, Series):
            return v.col
        if isinstance(v, Column):
            return v
        try:
            import numpy as np

            if isinstance(v, np.generic):
                v = v.item()
        except ImportError:
            pass
        return F.lit(v)

    # bit shifts: F.shiftleft/right take a plain int bit count
    if name in ("left_shift", "right_shift") and len(inputs) == 2:
        n = inputs[1]
        if hasattr(n, "item"):
            n = n.item()
        if isinstance(n, int):
            fn = F.shiftleft if name == "left_shift" else F.shiftright
            return fn(to_col(inputs[0]), n)
        return NotImplemented
    cols = [to_col(v) for v in inputs]
    if len(cols) == 1 and name in _UFUNC_UNARY:
        return _UFUNC_UNARY[name](cols[0])
    if len(cols) == 2 and name in _UFUNC_BINARY:
        return _UFUNC_BINARY[name](cols[0], cols[1])
    return NotImplemented


def _column_array_ufunc(self, ufunc, method, *inputs, **kwargs):
    return _ufunc_dispatch(ufunc, method, inputs, kwargs)


# attach to pyspark Column so intermediate Columns stay dispatchable
# (additive: defines only the numpy interop dunder)
Column.__array_ufunc__ = _column_array_ufunc
