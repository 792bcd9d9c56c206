"""cuDF-compatible DataFrame veneer over Spark (SURVEY.md §1.1 mapping).

The reference exposes pandas semantics (cudf.DataFrame,
core/dataframe.py:104) over an eager columnar engine; this wrapper
exposes the same *API shape* over a lazy Spark plan. A user of the
reference keeps their call sites — ``merge``/``groupby``/``query``/
``sort_values``/``head``/``assign``/… — and gains Catalyst planning,
shuffle-based scale-out, and spill-safe execution.

Row-order discipline (SURVEY.md §7 hard-parts): cuDF rows are ordered;
Spark DataFrames are unordered multisets. Every wrapper carries a
hidden ``__row_id`` column — ``monotonically_increasing_id()`` at
ingest (stable per partition layout), replaced by ``row_number`` over
the sort keys after ``sort_values``. Order-sensitive ops (``head``,
``tail``, ``shift``, ``cumsum``, dedup ``keep=first/last``) are defined
against that column, never physical layout, so they stay correct under
AQE re-planning and 1000-way parallelism.

Scale notes: ``head/tail`` are global-order limits (TakeOrdered at the
driver's k, not a full sort); ``merge`` defers join strategy to
Catalyst/AQE (broadcast below threshold, else shuffle); nothing here
ever collects to the driver except ``to_pandas`` (documented
small-data, like cuDF's own host round-trips).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column
from pyspark.sql import DataFrame as SDF
from pyspark.sql import Window
from pyspark.sql import functions as F

_RID = "__row_id"

# Row-MultiIndex encoding (reference core/multiindex.py row-index
# workflows: set_index([a,b]) -> groupby(level=) / unstack(level=)).
# Index levels live as HIDDEN physical columns named
# "__dlmi_{level:02d}_{name}" — the level order and label ride in the
# column name itself, so the index survives every `_with()` without
# extra object state (the same trick as _RID).
_MI_PREFIX = "__dlmi_"


def _mi_phys(level: int, name: str) -> str:
    return f"{_MI_PREFIX}{level:02d}_{name}"


def _mi_parse(col: str) -> tuple[int, str]:
    body = col[len(_MI_PREFIX):]
    return int(body[:2]), body[3:]


def from_spark(sdf: SDF) -> "DataFrame":
    """Wrap a Spark DataFrame, materializing the ingest order."""
    return DataFrame(sdf.withColumn(_RID, F.monotonically_increasing_id()))


class DataFrame:
    """pandas/cuDF-style API over a Spark plan (core/dataframe.py:104)."""

    def __init__(self, sdf: SDF):
        if _RID not in sdf.columns:
            sdf = sdf.withColumn(_RID, F.monotonically_increasing_id())
        self.__sdf_cached = sdf
        self.__sdf_thunk = None

    @classmethod
    def _lazy(cls, thunk) -> "DataFrame":
        """Frame whose Spark plan is built on first access. Used by
        sort_values: the distributed re-key runs a boundary-sampling
        collect at plan-CONSTRUCTION time, so deferring it lets
        composed consumers (head/tail/len) substitute cheaper plans —
        sort_values().head(n) becomes one TakeOrderedAndProject with
        no sampling, no shuffle (r3 advice: eager per-op sampling)."""
        obj = cls.__new__(cls)
        obj._DataFrame__sdf_cached = None
        obj._DataFrame__sdf_thunk = thunk
        return obj

    @property
    def _sdf(self) -> SDF:
        if self.__sdf_cached is None and self.__sdf_thunk is not None:
            self.__sdf_cached = self.__sdf_thunk()
            self.__sdf_thunk = None
        return self.__sdf_cached

    @_sdf.setter
    def _sdf(self, v: SDF) -> None:
        self.__sdf_cached = v
        self.__sdf_thunk = None

    # -- plumbing -------------------------------------------------------

    @property
    def spark(self) -> SDF:
        """The underlying Spark DataFrame (order column dropped)."""
        return self._sdf.drop(_RID)

    @property
    def columns(self) -> list[str]:
        return [
            c for c in self._sdf.columns
            if c != _RID and not c.startswith(_MI_PREFIX)
        ]

    def _row_mi(self) -> list[tuple[str, int, str]]:
        """The row-MultiIndex levels as [(physical_col, level, name)],
        level-ordered; empty when the frame has no row index."""
        out = [
            (c, *_mi_parse(c))
            for c in self._sdf.columns
            if c.startswith(_MI_PREFIX)
        ]
        return sorted(out, key=lambda t: t[1])

    @property
    def index_names(self) -> list[str] | None:
        """Row-index level names after ``set_index([a, b])`` (the
        pandas ``df.index.names`` read), else None."""
        mi = self._row_mi()
        return [name for _, _, name in mi] or None

    def _mi_resolve(self, level) -> list[tuple[str, str]]:
        """level spec (int | name | list) → [(physical, plain_name)]."""
        mi = self._row_mi()
        if not mi:
            raise TypeError(
                "level= needs a row MultiIndex — call set_index([...]) first"
            )
        levels = level if isinstance(level, (list, tuple)) else [level]
        out = []
        for lv in levels:
            if isinstance(lv, int):
                lv = lv if lv >= 0 else len(mi) + lv
                if not 0 <= lv < len(mi):
                    raise KeyError(f"index level {lv} out of range")
                phys, _, name = mi[lv]
            else:
                match = [t for t in mi if t[2] == lv]
                if not match:
                    raise KeyError(f"no index level named {lv!r}")
                phys, _, name = match[0]
            out.append((phys, name))
        return out

    @columns.setter
    def columns(self, new) -> None:
        """``df.columns = [...]`` — the pandas rename-in-place idiom
        (including the MultiIndex flatten: tuples join on '_')."""
        old = self.columns
        new = list(new)
        assert len(new) == len(old), f"expected {len(old)} labels, got {len(new)}"
        names = [
            "_".join(str(p) for p in c if p != "") if isinstance(c, tuple) else c
            for c in new
        ]
        self._sdf = self._sdf.withColumnsRenamed(dict(zip(old, names)))
        self._col_tuples = None

    @property
    def columns_tuples(self):
        """Multi-level column labels (a core.multiindex.MultiIndex) when
        the frame came from a multi-agg groupby/pivot, else None. The
        physical Spark columns stay flat — this is the label view cuDF
        code reads via ``out.columns`` after ``agg({col: [fns]})``."""
        return getattr(self, "_col_tuples", None)

    def _with(self, sdf: SDF) -> "DataFrame":
        return DataFrame(sdf)

    def _rid_bounds(self) -> list:
        """Boundary sample for ``[_RID]``-keyed order primitives,
        computed at most ONCE per RID-set and threaded through derived
        frames (r4 verdict #6: every chained veneer op — sort_values →
        diff → cumsum — otherwise re-runs the boundary-sampling collect
        against its ever-growing upstream plan). Safe to share because
        boundary placement affects only load balance, never results —
        but it is only propagated where RID VALUES survive verbatim
        (_with_same_rids): stale boundaries from a different RID domain
        would funnel the data into one bucket."""
        if getattr(self, "_rid_bounds_cache", None) is None:
            from pygdf_spark.operators.order import sample_boundaries

            self._rid_bounds_cache = sample_boundaries(self._sdf, [_RID])
        return self._rid_bounds_cache

    def _with_same_rids(self, sdf: SDF) -> "DataFrame":
        """_with for outputs that keep every row's _RID value unchanged
        (shift/diff/scan results): the boundary cache stays valid."""
        out = self._with(sdf)
        out._rid_bounds_cache = getattr(self, "_rid_bounds_cache", None)
        return out

    def _ordered(self) -> SDF:
        return self._sdf.orderBy(_RID)

    def __len__(self) -> int:
        ps = getattr(self, "_presort", None)
        if ps is not None and self.__sdf_cached is None:
            return ps[0].count()  # count is order-independent: skip the re-key
        return self._sdf.count()

    @property
    def shape(self) -> tuple[int, int]:
        return (len(self), len(self.columns))

    def to_pandas(self):
        """Host round-trip (small-data, like cuDF to_pandas). Funnels
        every row through the driver — guarded by the max_driver_rows
        option; at scale, write_parquet instead."""
        from pygdf_spark.options import check_driver_rows

        check_driver_rows(self._sdf, "to_pandas")
        return self._ordered().drop(_RID).toPandas()

    # -- selection / projection (dataframe.py __getitem__/assign) -------

    def _flat_name(self, key) -> str:
        """Resolve a (col, fn)-style tuple label against the frame's
        multi-level column labels (or the physical name convention)."""
        mi = self.columns_tuples
        if mi is not None and tuple(key) in mi:
            return self.columns[list(mi).index(tuple(key))]
        joined = "_".join(str(p) for p in key if p != "")
        if joined in self.columns:
            return joined
        raise KeyError(f"no column labelled {tuple(key)!r}")

    def __getitem__(self, key):
        if isinstance(key, str):
            from pygdf_spark.core.series import Series

            return Series(self, key)
        if isinstance(key, tuple):  # multi-level column label
            from pygdf_spark.core.series import Series

            return Series(self, self._flat_name(key))
        if isinstance(key, Column):  # boolean-mask filter
            return self._with(self._sdf.filter(key))
        if isinstance(key, Iterable):
            cols = [self._flat_name(c) if isinstance(c, tuple) else c for c in key]
            return self._with(self._sdf.select(_RID, *cols))
        raise TypeError(f"unsupported key {key!r}")

    def assign(self, **kwargs) -> "DataFrame":
        """assign (dataframe.py method list): add/replace columns.
        Row set and _RID values are untouched, so the order-primitive
        boundary cache rides along (sort_values→assign→cumsum chains
        stay at one sampling per key-set)."""
        sdf = self._sdf
        for name, expr in kwargs.items():
            sdf = sdf.withColumn(name, expr)
        return self._with_same_rids(sdf)

    def drop(self, columns: list[str] | str) -> "DataFrame":
        cols = [columns] if isinstance(columns, str) else list(columns)
        return self._with_same_rids(self._sdf.drop(*cols))

    def rename(self, columns: dict[str, str]) -> "DataFrame":
        return self._with(self._sdf.withColumnsRenamed(columns))

    def astype(self, dtypes: dict[str, str]) -> "DataFrame":
        sdf = self._sdf
        for c, t in dtypes.items():
            if t == "category" or type(t).__name__ == "CategoricalDtype":
                continue  # dictionary-as-dim-table: values column stays
            t = t.to_spark() if hasattr(t, "to_spark") else t  # cudf *Dtype markers
            sdf = sdf.withColumn(c, F.col(c).cast(t))
        return self._with(sdf)

    def insert(self, loc: int, name: str, value) -> "DataFrame":
        """DataFrame.insert (dataframe.py method list) — add a column at
        ordinal position `loc` (cuDF mutates in place; the veneer
        returns the new frame like its other projections)."""
        cols = self.columns
        cols.insert(loc, name)
        sdf = self._sdf.withColumn(
            name, value if isinstance(value, Column) else F.lit(value)
        )
        return self._with(sdf.select(_RID, *cols))

    def pop(self, name: str):
        """DataFrame.pop — return the column as a Series and remove it
        from this frame (in-place removal, matching cuDF/pandas)."""
        from pygdf_spark.core.series import Series

        snapshot = self._with(self._sdf)
        self._sdf = self._sdf.drop(name)
        return Series(snapshot, name)

    # -- filters (§2.2) --------------------------------------------------

    def query(self, expr: str) -> "DataFrame":
        """query (dataframe.py:4610 → queryutils.py numba kernel);
        Spark's SQL parser + codegen replace the CUDA JIT."""
        return self._with(self._sdf.filter(expr))

    def isin_filter(self, col: str, values) -> "DataFrame":
        """isin-mask filter (dataframe.py:5975, search.hpp:164)."""
        return self._with(self._sdf.filter(F.col(col).isin(list(values))))

    def dropna(self, subset=None, how: str = "any", thresh: int | None = None) -> "DataFrame":
        """dropna (frame.py:1079, stream_compaction.hpp:69)."""
        data_cols = subset or self.columns
        return self._with(self._sdf.na.drop(how=how, thresh=thresh, subset=data_cols))

    def fillna(self, value) -> "DataFrame":
        """fillna (frame.py:1193, replace.hpp:50)."""
        return self._with(self._sdf.na.fill(value))

    def clip(self, col: str, lower, upper) -> "DataFrame":
        """clip (frame.py:700, replace.hpp:202)."""
        c = F.greatest(F.lit(lower), F.least(F.lit(upper), F.col(col)))
        return self._with(self._sdf.withColumn(col, c))

    def replace(self, to_replace, value=None, subset=None) -> "DataFrame":
        """replace (frame.py:2205, replace.hpp:151 find_and_replace_all)
        — value substitution via Spark's native na.replace (a dict maps
        old → new; a scalar pair replaces one value)."""
        mapping = to_replace if isinstance(to_replace, dict) else {to_replace: value}
        return self._with(self._sdf.na.replace(mapping, subset=subset))

    def isnull(self) -> "DataFrame":
        """isnull (frame.py:2290) — boolean frame of null masks."""
        return self._with(
            self._sdf.select(_RID, *[F.col(c).isNull().alias(c) for c in self.columns])
        )

    def notnull(self) -> "DataFrame":
        """notnull (frame.py:2370)."""
        return self._with(
            self._sdf.select(_RID, *[F.col(c).isNotNull().alias(c) for c in self.columns])
        )

    # -- order-sensitive ops (§7 discipline) -----------------------------

    def sort_values(self, by, ascending=True, na_position: str = "last") -> "DataFrame":
        """sort_values (dataframe.py:3949, sorting.hpp:114): re-keys the
        order column to the new sort (stable: old order breaks ties).

        The re-key is LAZY: nothing is sampled or shuffled until the
        sorted order is actually consumed, and top/bottom consumers
        (head/tail) replace the full distributed sort with one
        TakeOrderedAndProject pass."""
        by = [by] if isinstance(by, str) else list(by)
        asc = [ascending] * len(by) if isinstance(ascending, bool) else list(ascending)
        nulls = "nulls_last" if na_position == "last" else "nulls_first"
        keys = [(c, "asc" if a else "desc", nulls) for c, a in zip(by, asc)]
        keys.append(_RID)  # stability
        from pygdf_spark.operators.order import rekey_row_id

        base = self._sdf
        out = DataFrame._lazy(lambda: rekey_row_id(base, keys, _RID))
        out._presort = (base, keys)
        out._col_tuples = self.columns_tuples
        return out

    @staticmethod
    def _presort_cols(keys, reverse: bool = False) -> list:
        """Spark sort-order Columns for a sort_values key spec (the
        order.py _spec convention: plain name = asc nulls_first).
        ``reverse`` inverts both direction and null placement — the
        exact mirror order, for tail()."""
        cols = []
        for k in keys:
            if isinstance(k, tuple):
                c, d, nl = k
                a = (d == "asc") != reverse
                nf = (nl == "nulls_first") != reverse
            else:
                c, a, nf = k, not reverse, not reverse
            col = F.col(c) if isinstance(c, str) else c
            if a:
                cols.append(col.asc_nulls_first() if nf else col.asc_nulls_last())
            else:
                cols.append(col.desc_nulls_first() if nf else col.desc_nulls_last())
        return cols

    def head(self, n: int = 5) -> "DataFrame":
        ps = getattr(self, "_presort", None)
        if ps is not None:
            # top-n of a pending sort: TakeOrderedAndProject — no
            # sampling, no shuffle; the re-rid window spans ≤ n rows
            # (bounded small data, not a scale hazard)
            base, keys = ps
            cols = self._presort_cols(keys)
            sdf = base.orderBy(*cols).limit(n)
            return self._with(
                sdf.withColumn(_RID, F.row_number().over(Window.orderBy(*cols)))
            )
        return self._with(self._ordered().limit(n))

    def tail(self, n: int = 5) -> "DataFrame":
        ps = getattr(self, "_presort", None)
        if ps is not None:
            base, keys = ps
            sdf = base.orderBy(*self._presort_cols(keys, reverse=True)).limit(n)
            fwd = self._presort_cols(keys)
            return self._with(
                sdf.withColumn(_RID, F.row_number().over(Window.orderBy(*fwd)))
            )
        return self._with(self._sdf.orderBy(F.col(_RID).desc()).limit(n))

    def shift(self, col: str, periods: int = 1) -> "DataFrame":
        """Series.shift (frame.py:1644, copying.hpp:375) over the row
        order — distributed: row n equi-joins row n−periods on the
        global row number (operators/order.py), never a single-task
        window."""
        from pygdf_spark.operators.order import global_shift

        return self._with_same_rids(
            global_shift(self._sdf, [_RID], {f"{col}_shift": col}, periods,
                         boundaries=self._rid_bounds())
        )

    def cumsum(self, col: str) -> "DataFrame":
        """cumsum (dataframe.py cummethods, reduction.hpp:90 scan)."""
        return self._cum(col, F.sum, "cumsum")

    def cummax(self, col: str) -> "DataFrame":
        return self._cum(col, F.max, "cummax")

    def cummin(self, col: str) -> "DataFrame":
        return self._cum(col, F.min, "cummin")

    def _cum(self, col: str, fn, suffix: str) -> "DataFrame":
        """Missing inputs (null / float-NaN) produce a missing scan
        output at that row, and the scan continues past them — pandas /
        reference scan semantics (null_policy EXCLUDE). Distributed:
        two-level prefix scan (operators/order.py) — per-range-partition
        window + one total per partition folded back, never a
        single-task window."""
        from pygdf_spark.operators.order import prefix_scan

        kind = {"cumsum": "sum", "cummin": "min", "cummax": "max"}[suffix]
        v = self._nn(col)
        return self._with_same_rids(
            prefix_scan(
                self._sdf, [_RID], v, kind, f"{col}_{suffix}",
                mask=v.isNotNull(), boundaries=self._rid_bounds()
            )
        )

    def diff(self, col: str) -> "DataFrame":
        """Series.diff (series.py:5652): c − lag(c) over the row order,
        via the distributed shift join."""
        from pygdf_spark.operators.order import global_shift

        shifted = global_shift(self._sdf, [_RID], {"__prev": col}, 1,
                               boundaries=self._rid_bounds())
        return self._with_same_rids(
            shifted.withColumn(f"{col}_diff", F.col(col) - F.col("__prev")).drop("__prev")
        )

    def drop_duplicates(self, subset=None, keep: str = "first") -> "DataFrame":
        """drop_duplicates keep=first/last (frame.py:2155,
        stream_compaction.hpp:238) — keep resolved against row order."""
        subset = subset or self.columns
        order = F.col(_RID).asc() if keep == "first" else F.col(_RID).desc()
        w = Window.partitionBy(*subset).orderBy(order)
        return self._with(
            self._sdf.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    def nlargest(self, n: int, col: str) -> "DataFrame":
        """nlargest (dataframe.py:4142) — TakeOrdered on the full data
        (never a global sort), then the n-row result is re-keyed to the
        value order, matching pandas' sorted output."""
        top = self._with(self._sdf.orderBy(F.col(col).desc(), F.col(_RID)).limit(n))
        return top.sort_values(col, ascending=False)

    def nsmallest(self, n: int, col: str) -> "DataFrame":
        bot = self._with(self._sdf.orderBy(F.col(col).asc(), F.col(_RID)).limit(n))
        return bot.sort_values(col, ascending=True)

    def take(self, indices: list[int]) -> "DataFrame":
        """take (dataframe.py method list, copying.hpp:191): select rows
        by ordinal position. Positions are resolved with the distributed
        global row number (positional gather is inherently
        order-coupled; cuDF pays the same full-column gather)."""
        from pygdf_spark.operators.order import global_row_number

        return self._with_same_rids(
            global_row_number(self._sdf, [_RID], "__pos",
                              boundaries=self._rid_bounds())
            .filter((F.col("__pos") - 1).isin([int(i) for i in indices]))
            .drop("__pos")
        )

    def sample(self, frac: float, seed: int = 0) -> "DataFrame":
        """sample (frame.py:1785, copying.hpp:913)."""
        return self._with(self._sdf.sample(fraction=frac, seed=seed))

    def explode(self, column: str) -> "DataFrame":
        """explode (dataframe.py:7700, lists/explode.hpp:63): one row per
        list element; order extends (row, element-position)."""
        others = [c for c in self._sdf.columns if c != column]
        from pygdf_spark.operators.order import rekey_row_id

        sdf = self._sdf.select(
            *others, F.posexplode_outer(column).alias("__p", column)
        )
        return self._with(rekey_row_id(sdf, [_RID, "__p"], _RID).drop("__p"))

    def interleave_columns(self, columns: list[str], name: str = "value") -> "DataFrame":
        """interleave_columns (frame.py:2450, reshape.hpp:49) — row-major
        interleave of same-dtype columns into one column; order extends
        (row, column-position)."""
        from pygdf_spark.operators.order import rekey_row_id

        sdf = self._sdf.select(_RID, F.posexplode(F.array(*columns)).alias("__p", name))
        return self._with(rekey_row_id(sdf, [_RID, "__p"], _RID).drop("__p"))

    def transpose(self) -> "DataFrame":
        """transpose (dataframe.py:4292, transpose.hpp) — documented
        small-data: collects to the driver (cuDF's transpose is likewise
        a full-table materialization) and requires homogeneous column
        dtypes. Output columns are r0..rN in row order."""
        tp = self.to_pandas().T
        tp.columns = [f"r{i}" for i in range(tp.shape[1])]
        tp = tp.reset_index().rename(columns={"index": "column"})
        return from_spark(self._sdf.sparkSession.createDataFrame(tp))

    @property
    def T(self) -> "DataFrame":
        return self.transpose()

    def hash_values(self, method: str = "murmur3") -> "DataFrame":
        """hash_values (series.py:5336, hashing.hpp:39) — per-row hash
        over all columns as a new `hash` column. murmur3 → Spark's
        native Murmur3 F.hash; also md5 / xxhash64."""
        if method == "md5":
            h = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in self.columns]))
        elif method == "xxhash64":
            h = F.xxhash64(*[F.col(c) for c in self.columns])
        else:
            h = F.hash(*[F.col(c) for c in self.columns])
        return self._with(self._sdf.withColumn("hash", h))

    def partition_by_hash(self, columns: list[str], nparts: int) -> "DataFrame":
        """partition_by_hash (dataframe.py:4862, partitioning.hpp:93) —
        physically repartitions by key hash (the distributed analog of
        the reference's list-of-frames return) and carries the partition
        id as a column. Spark's HashPartitioning is pmod(murmur3, n), so
        `partition_id` matches the physical partition."""
        part = F.pmod(F.hash(*[F.col(c) for c in columns]), F.lit(nparts))
        return self._with(
            self._sdf.withColumn("partition_id", part).repartition(nparts, *columns)
        )

    def scatter_by_map(self, map_column: str, nparts: int) -> "DataFrame":
        """scatter_by_map (frame.py:1017, partitioning.hpp:67) — route
        rows to partitions keyed by an integer map column. Delta vs the
        reference: assignment is hash(map)%n rather than identity, which
        preserves the semantic contract (equal map values co-locate) —
        identity routing would need an RDD-level custom partitioner."""
        return self._with(self._sdf.repartition(nparts, F.col(map_column)))

    def one_hot_encoding(self, column: str, prefix: str, cats: list) -> "DataFrame":
        """one_hot_encoding (dataframe.py method list; reshape.py:566) —
        one 0/1 column per listed category."""
        sdf = self._sdf
        for v in cats:
            sdf = sdf.withColumn(f"{prefix}_{v}", (F.col(column) == F.lit(v)).cast("int"))
        return self._with(sdf)

    def label_encoding(self, column: str, cats: list, dtype: str = "int") -> "DataFrame":
        """label_encoding (series.py:3777) — category → ordinal code via
        a literal-map lookup; values outside `cats` get -1 (the cuDF
        na_sentinel)."""
        mapping = F.create_map(*[x for i, v in enumerate(cats) for x in (F.lit(v), F.lit(i))])
        code = F.coalesce(F.element_at(mapping, F.col(column)), F.lit(-1)).cast(dtype)
        return self._with(self._sdf.withColumn(f"{column}_labels", code))

    def melt(self, id_vars: list[str], value_vars: list[str],
             var_name: str = "variable", value_name: str = "value") -> "DataFrame":
        """melt (core/reshape.py:394) → Spark unpivot."""
        from pygdf_spark.operators.order import rekey_row_id

        sdf = self._sdf.unpivot(
            [_RID, *id_vars], value_vars, var_name, value_name
        )
        return self._with(rekey_row_id(sdf, [var_name, _RID], _RID))

    def pivot(self, index: str, columns: str, values: str) -> "DataFrame":
        """pivot (core/reshape.py:843): groupBy(index).pivot(columns)
        .agg(first(values))."""
        out = (
            self._sdf.groupBy(index).pivot(columns).agg(F.first(values))
        )
        return DataFrame(out.withColumn(_RID, F.monotonically_increasing_id()))

    def where(self, cond: Column, other=None) -> "DataFrame":
        """where (frame.py:827, copy_if_else copying.hpp:705): keep
        values where cond holds, else replace (pandas semantics: the
        condition applies per numeric column)."""
        sdf = self._sdf
        for c in self.columns:
            sdf = sdf.withColumn(c, F.when(cond, F.col(c)).otherwise(F.lit(other)))
        return self._with(sdf)

    def mask(self, cond: Column, other=None) -> "DataFrame":
        """mask (frame.py:884): complement of where."""
        return self.where(~cond, other)

    def round(self, decimals: int = 0) -> "DataFrame":
        """round (frame.py:1670, round.hpp:70): pandas/cuDF default is
        HALF_EVEN → Spark ``bround`` (``F.round`` would be HALF_UP)."""
        sdf = self._sdf
        for c, t in self._sdf.dtypes:
            if c != _RID and t in ("double", "float"):
                sdf = sdf.withColumn(c, F.bround(c, decimals))
        return self._with(sdf)

    def rank(self, col: str, method: str = "min", ascending: bool = True,
             na_option: str = "keep") -> "DataFrame":
        """rank (frame.py:1459, sorting.hpp:178) over one column.

        ``na_option='keep'`` (the reference/pandas default): missing
        values (null, or NaN in float columns) receive a null rank and
        do not consume rank positions — they sort past every ranked row
        so non-missing ranks are unaffected. 'top'/'bottom' rank them
        first/last instead."""
        from pygdf_spark.operators.order import global_rank

        v = self._nn(col)
        if na_option in ("keep", "bottom"):
            nulls = "nulls_last"
        elif na_option == "top":
            nulls = "nulls_first"
        else:
            raise ValueError(f"na_option={na_option!r}")
        order = (v, "asc" if ascending else "desc", nulls)
        # distributed: value-bucketed rank + per-bucket offsets
        # (operators/order.py) — equal values co-locate, so bucket
        # ranks are exact after the offset; 'first' needs a total order
        # so the row id breaks ties inside global_rank's window
        out = global_rank(self._sdf, v, order, method, "__rank", tiebreak=[F.col(_RID)])
        expr = F.col("__rank")
        if na_option == "keep":
            expr = F.when(v.isNotNull(), expr)
        return self._with(
            out.withColumn(f"{col}_rank", expr.cast("double")).drop("__rank")
        )

    def rolling(self, window: int, min_periods: int | None = None) -> "Rolling":
        """rolling (core/window/rolling.py:17) over the row order."""
        return Rolling(self, window, min_periods)

    # -- identity / structure (frame.py utility surface) -----------------

    def copy(self, deep: bool = True) -> "DataFrame":
        """copy (frame.py method list) — plans are immutable, so copy is
        a new wrapper over the same lineage (cuDF's deep copy exists to
        decouple device buffers; there is no shared mutable state here)."""
        return self._with(self._sdf)

    def pipe(self, func, *args, **kwargs):
        """pipe (frame.py method list): func(self, *args, **kwargs)."""
        return func(self, *args, **kwargs)

    def keys(self) -> list[str]:
        """keys (dataframe.py method list) — column labels."""
        return self.columns

    @property
    def dtypes(self) -> dict[str, str]:
        """dtypes (dataframe.py property) — column → Spark SQL type."""
        return {c: t for c, t in self._sdf.dtypes if c != _RID}

    @property
    def empty(self) -> bool:
        """empty (frame.py property)."""
        return self._sdf.isEmpty()

    @property
    def ndim(self) -> int:
        return 2

    @property
    def size(self) -> int:
        return len(self) * len(self.columns)

    def equals(self, other: "DataFrame") -> bool:
        """equals (frame.py:2482) — same shape, columns, and row-for-row
        values (nulls equal). Distributed compare: an exceptAll in both
        directions over the order-keyed rows, no driver collect."""
        if self.columns != other.columns:
            return False
        a, b = self._pos_sdf(), other._pos_sdf()
        return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()

    def _pos_sdf(self) -> SDF:
        """Rows keyed by ordinal position (not raw rid values) — the
        distributed global row number, never a single-task window."""
        from pygdf_spark.operators.order import global_row_number

        return global_row_number(self._sdf, [_RID], "__pos",
                                 boundaries=self._rid_bounds()).drop(_RID)

    def isin(self, values) -> "DataFrame":
        """isin (dataframe.py:5975, search.hpp:164) — boolean frame; a
        list tests every column, a dict tests per column. Values whose
        Python type can't inhabit a column's dtype are dropped for that
        column (pandas: type mismatch is simply False) — also keeps the
        comparison cast-free under ANSI sessions."""
        import datetime

        type_gate = {
            "string": (str,), "boolean": (bool,),
            "timestamp": (datetime.datetime,), "timestamp_ntz": (datetime.datetime,),
            "date": (datetime.date,),
        }
        cols = []
        for c, t in self._sdf.dtypes:
            if c == _RID:
                continue
            vals = values.get(c, []) if isinstance(values, dict) else list(values)
            ok = type_gate.get(t, (int, float))
            vals = [v for v in vals if isinstance(v, ok) and not (
                ok == (int, float) and isinstance(v, bool))]
            hit = F.coalesce(F.col(c).isin(vals), F.lit(False)) if vals else F.lit(False)
            cols.append(hit.alias(c))  # null cell → False, as pandas
        return self._with(self._sdf.select(_RID, *cols))

    def nans_to_nulls(self) -> "DataFrame":
        """nans_to_nulls (frame.py:2542): NaN → null in float columns so
        null-aware ops (counts, joins, dropna) treat both uniformly."""
        sdf = self._sdf
        for c, t in self._sdf.dtypes:
            if c != _RID and t in ("double", "float"):
                sdf = sdf.withColumn(c, F.when(~F.isnan(c), F.col(c)))
        return self._with(sdf)

    def select_dtypes(self, include=None, exclude=None) -> "DataFrame":
        """select_dtypes (dataframe.py:6040) over Spark SQL type names."""
        inc = {include} if isinstance(include, str) else set(include or ())
        exc = {exclude} if isinstance(exclude, str) else set(exclude or ())
        keep = [
            c for c, t in self._sdf.dtypes
            if c != _RID and (not inc or t in inc) and t not in exc
        ]
        return self[keep]

    def memory_usage(self) -> int:
        """memory_usage (frame.py method list) — Catalyst's size estimate
        for the plan output in bytes (the honest distributed analog of
        cuDF's device-buffer accounting; no data is collected)."""
        return int(self._sdf._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())

    # -- numeric elementwise (frame.py binary-op surface) ----------------

    def _numeric_cols(self) -> list[str]:
        return [
            c for c, t in self._sdf.dtypes
            if c != _RID and t in ("double", "float", "bigint", "int", "smallint", "tinyint")
        ]

    def _binop(self, other, fn) -> "DataFrame":
        sdf = self._sdf
        for c in self._numeric_cols():
            sdf = sdf.withColumn(c, fn(F.col(c), F.lit(other)))
        return self._with(sdf)

    def add(self, other):
        """add/radd … (frame.py arithmetic surface): scalar broadcast
        over every numeric column, like cuDF's binaryop launches."""
        return self._binop(other, lambda a, b: a + b)

    def sub(self, other):
        return self._binop(other, lambda a, b: a - b)

    def mul(self, other):
        return self._binop(other, lambda a, b: a * b)

    def truediv(self, other):
        return self._binop(other, lambda a, b: a / b)

    def floordiv(self, other):
        return self._binop(other, lambda a, b: F.floor(a / b).cast("double"))

    def mod(self, other):
        return self._binop(other, lambda a, b: F.pmod(a, b))

    def pow(self, other):
        return self._binop(other, lambda a, b: F.pow(a, b))

    def radd(self, other):
        return self.add(other)

    def rsub(self, other):
        return self._binop(other, lambda a, b: b - a)

    def rmul(self, other):
        return self.mul(other)

    def rtruediv(self, other):
        return self._binop(other, lambda a, b: b / a)

    def rfloordiv(self, other):
        return self._binop(other, lambda a, b: F.floor(b / a).cast("double"))

    def rmod(self, other):
        return self._binop(other, lambda a, b: F.pmod(b, a))

    def rpow(self, other):
        return self._binop(other, lambda a, b: F.pow(b, a))

    def cumprod(self, col: str) -> "DataFrame":
        """cumprod (frame.py scan surface, reduction.hpp:90): exact
        product scan via an array fold over the trailing frame (Spark
        has no product window aggregate; exp∘sum∘log would drift)."""
        from pygdf_spark.operators.order import prefix_scan

        v = self._nn(col)
        return self._with_same_rids(
            prefix_scan(
                self._sdf, [_RID], v, "prod", f"{col}_cumprod",
                mask=v.isNotNull(), boundaries=self._rid_bounds()
            )
        )

    # -- index discipline (reset/set/sort_index, frame.py surface) -------

    def reset_index(self, drop: bool = False) -> "DataFrame":
        """reset_index (frame.py method list): re-key the order column to
        0..n-1; drop=False surfaces the old position as `index`. On a
        row-MultiIndexed frame the level columns come back as leading
        data columns (or are dropped with drop=True) — the pandas
        round-trip inverse of ``set_index([...])``."""
        from pygdf_spark.operators.order import global_row_number

        mi = self._row_mi()
        if mi:
            sdf = self._sdf
            names = []
            for phys, _, name in mi:
                if drop:
                    sdf = sdf.drop(phys)
                else:
                    sdf = sdf.withColumnRenamed(phys, name)
                    names.append(name)
            return self._with(sdf.select(_RID, *names, *self.columns))
        sdf = global_row_number(self._sdf, [_RID], "__pos").withColumn(
            "__pos", F.col("__pos") - 1
        )
        cols = self.columns
        if not drop:
            sdf = sdf.withColumn("index", F.col("__pos"))
            cols = ["index", *cols]
        sdf = sdf.withColumn(_RID, F.col("__pos")).drop("__pos")
        return self._with(sdf.select(_RID, *cols))

    def set_index(self, col) -> "DataFrame":
        """set_index (frame.py method list): the named column becomes the
        order key (cuDF re-labels rows; the veneer's row identity IS the
        order column, so re-keying is the faithful analog). Ties break on
        prior order — stable, like cuDF's stable sort_index path.

        A LIST of columns builds a row MultiIndex (reference
        core/multiindex.py): the columns leave the data-column view and
        become hidden level columns; ``groupby(level=)`` /
        ``unstack(level=)`` / ``reset_index`` then operate on them.
        Row ORDER is preserved — pandas ``set_index`` never sorts
        (``sort_index`` does) — so this is a pure metadata rename, zero
        shuffles. Distribution shape: the index is ordinary columns —
        grouping by a level is a plain keyed shuffle, never a driver
        structure."""
        from pygdf_spark.operators.order import rekey_row_id

        if isinstance(col, (list, tuple)):
            sdf = self._sdf
            for i, c in enumerate(col):
                sdf = sdf.withColumnRenamed(c, _mi_phys(i, c))
            return self._with(sdf)
        return self._with(
            rekey_row_id(self._sdf, [(col, "asc", "nulls_last"), _RID], _RID)
        )

    def sort_index(self, ascending: bool = True) -> "DataFrame":
        """sort_index (frame.py:1380): order by the row key."""
        if ascending:
            return self._with(self._sdf)
        return self.reverse()

    def reverse(self) -> "DataFrame":
        """reverse (frame.py method list): flip the row order."""
        from pygdf_spark.operators.order import rekey_row_id

        return self._with(
            rekey_row_id(self._sdf, [(_RID, "desc", "nulls_last")], _RID)
        )

    # -- positional indexers (loc/iloc, indexed_frame.py surface) --------

    @property
    def iloc(self) -> "_ILoc":
        """iloc (indexed_frame.py): positional row selection."""
        return _ILoc(self)

    @property
    def loc(self) -> "_Loc":
        """loc (indexed_frame.py): boolean-mask (and mask+columns) row
        selection — label-based lookup degenerates to position because
        the veneer's index IS the positional order."""
        return _Loc(self)

    # -- reshape extras (stack / tile / repeat, reshape.hpp) -------------

    def stack(self) -> "DataFrame":
        """stack (dataframe.py:6585, reshape.hpp interleave): wide → long
        (variable, value) rows, row-major like cuDF/pandas."""
        return self.melt(id_vars=[], value_vars=self.columns)

    def unstack(self, index: str | None = None, columns: str | None = None,
                values: str | None = None, level=-1) -> "DataFrame":
        """unstack (dataframe.py:6650): long → wide.

        On a row-MultiIndexed frame (``set_index([a, b])``) the pandas
        form ``unstack(level=)`` pivots the named/numbered index level
        into columns; the remaining levels stay the row index. One
        Spark pivot — a keyed shuffle over the surviving levels, the
        pivoted domain becoming the column set (Spark collects and
        sorts the distinct pivot values, bounded by that domain's
        cardinality, same contract as ``pivot``). Single data column
        (the post-groupby shape); multi-column frames keep the explicit
        (index, columns, values) spelling.

        Without a row index the veneer takes the (index, columns,
        values) triple explicitly and pivots."""
        mi = self._row_mi()
        if index is None and mi:
            if len(mi) < 2:
                raise ValueError("unstack needs >= 2 index levels")
            tgt_phys, tgt_name = self._mi_resolve(level)[0]
            rest = [(p, lv, n) for p, lv, n in mi if p != tgt_phys]
            data = self.columns
            if len(data) != 1:
                raise NotImplementedError(
                    "row-MI unstack supports one data column (the "
                    "grouped-aggregate shape); use "
                    "unstack(index=, columns=, values=) for wide frames"
                )
            (val,) = data
            out = (
                self._sdf.groupBy(*[p for p, _, _ in rest])
                .pivot(tgt_phys)
                .agg(F.first(val))
            )
            # re-number the surviving levels 0..k-1 and re-key order
            from pygdf_spark.operators.order import rekey_row_id

            out = rekey_row_id(
                out,
                [(p, "asc", "nulls_last") for p, _, _ in rest],
                _RID,
            )
            for i, (p, _, n) in enumerate(rest):
                out = out.withColumnRenamed(p, _mi_phys(i, n))
            return self._with(out)
        if index is None or columns is None or values is None:
            raise TypeError(
                "unstack without a row MultiIndex needs index=, columns=, "
                "values="
            )
        return self.pivot(index=index, columns=columns, values=values)

    def repeat(self, repeats: int) -> "DataFrame":
        """repeat (frame.py:2604, filling.hpp repeat): each row `repeats`
        times, consecutively (row-major), order re-keyed."""
        from pygdf_spark.operators.order import rekey_row_id

        sdf = self._sdf.withColumn(
            "__copy", F.explode(F.sequence(F.lit(0), F.lit(int(repeats) - 1)))
        )
        return self._with(rekey_row_id(sdf, [_RID, "__copy"], _RID).drop("__copy"))

    def tile(self, count: int) -> "DataFrame":
        """tile (frame.py:2652, reshape.hpp:44): the whole frame repeated
        `count` times end-to-end."""
        from pygdf_spark.operators.order import rekey_row_id

        sdf = self._sdf.withColumn(
            "__copy", F.explode(F.sequence(F.lit(0), F.lit(int(count) - 1)))
        )
        return self._with(rekey_row_id(sdf, ["__copy", _RID], _RID).drop("__copy"))

    def update(self, other: "DataFrame") -> "DataFrame":
        """update (frame.py method list): positionally-aligned overwrite
        with other's non-null values (pandas semantics), as one
        position-keyed join."""
        a = self._pos_sdf()
        common = [c for c in other.columns if c in self.columns]
        b = other._pos_sdf().select(
            "__pos", *[F.col(c).alias(f"__o_{c}") for c in common]
        )
        joined = a.join(b, "__pos", "left")
        ftypes = dict(other._sdf.dtypes)
        for c in common:
            o = F.col(f"__o_{c}")
            if ftypes.get(c) in ("double", "float"):  # NaN is missing too
                o = F.when(~F.isnan(o), o)
            joined = joined.withColumn(c, F.coalesce(o, F.col(c))).drop(f"__o_{c}")
        return self._with(
            joined.withColumn(_RID, F.col("__pos")).drop("__pos").select(_RID, *self.columns)
        )

    def join(self, right: "DataFrame", on, how: str = "left",
             lsuffix: str = "_x", rsuffix: str = "_y") -> "DataFrame":
        """join (dataframe.py:4510) — column-keyed merge (the veneer has
        no MultiIndex; cuDF's join is merge-on-index)."""
        return self.merge(right, on=on, how=how, suffixes=(lsuffix, rsuffix))

    # -- MultiIndex level surface (reference core/multiindex.py xs/
    #    swaplevel/droplevel; labels live in _col_tuples, keys carry an
    #    empty second level — see GroupBy.agg) ---------------------------

    def _mi_key_cols(self) -> list[str]:
        """The group-key columns of a multi-agg output (their label
        tuples carry an empty level — at any position, so the
        convention survives swaplevel)."""
        mi = self.columns_tuples
        if mi is None:
            return []
        return [c for c, t in zip(self.columns, mi) if "" in t]

    def xs(self, key, axis: int = 0, level=None, drop_level: bool = True) -> "DataFrame":
        """Cross-section (reference core/dataframe.py xs / multiindex
        row selection). ``axis=0`` selects ROWS of a grouped output
        whose leading key columns equal ``key`` (a scalar or tuple —
        pandas ``out.xs('A')`` after a 2-key groupby); ``level`` may
        name the key column(s) explicitly. ``axis=1`` selects COLUMNS
        whose label tuple matches ``key`` at ``level`` and drops that
        label level. Distributed: row-xs is a filter (pushes to the
        scan); column-xs is a projection."""
        from pygdf_spark.core.multiindex import MultiIndex

        mi = self.columns_tuples
        if axis == 1:
            if mi is None:
                raise TypeError("xs(axis=1) needs multi-level column labels")
            lv = mi._level_num(level or 0)
            # the group-key columns play the row-index role (pandas
            # keeps the index through a column xs) — always retained
            key_cols = self._mi_key_cols()
            keep = [
                (c, t) for c, t in zip(self.columns, mi)
                if t[lv] == key and "" not in t
            ]
            if not keep:
                raise KeyError(key)
            rem = [tuple(p for i, p in enumerate(t) if i != lv) for _, t in keep]
            if mi.nlevels <= 2:
                names = [str(r[0]) for r in rem]
            else:
                names = ["_".join(str(p) for p in r if p != "") for r in rem]
            if len(set(names)) != len(names):
                raise ValueError(f"xs would create duplicate columns {names}")
            sdf = self._sdf.select(
                _RID, *key_cols,
                *[F.col(c).alias(n) for (c, _), n in zip(keep, names)],
            )
            out = self._with(sdf)
            if mi.nlevels > 2:
                width = mi.nlevels - 1
                out._col_tuples = MultiIndex(
                    [(k,) + ("",) * (width - 1) for k in key_cols] + rem
                )
            return out
        key = key if isinstance(key, tuple) else (key,)
        if level is not None:
            key_cols = [level] if isinstance(level, str) else list(level)
        else:
            key_cols = self._mi_key_cols()[: len(key)]
            if not key_cols:
                raise TypeError(
                    "xs(axis=0) needs grouped-output key columns (or pass "
                    "level=<key column name(s)>)"
                )
        if len(key_cols) != len(key):
            raise KeyError(f"key {key!r} does not match key columns {key_cols}")
        cond = F.lit(True)
        for c, v in zip(key_cols, key):
            cond = cond & (F.col(c) == F.lit(v))
        sdf = self._sdf.filter(cond)
        if drop_level:
            sdf = sdf.drop(*key_cols)
        out = self._with(sdf)
        if mi is not None:
            kept = [
                t for c, t in zip(self.columns, mi)
                if not (drop_level and c in key_cols)
            ]
            out._col_tuples = MultiIndex(kept, mi.names)
        return out

    def swaplevel(self, i=-2, j=-1, axis: int = 1) -> "DataFrame":
        """Swap column-label levels (multiindex.py swaplevel; the
        physical columns are untouched — labels only)."""
        mi = self.columns_tuples
        if axis != 1 or mi is None:
            raise TypeError("swaplevel: only multi-level column labels here")
        out = self._with(self._sdf)
        out._col_tuples = mi.swaplevel(i, j)
        return out

    def droplevel(self, level=0, axis: int = 1) -> "DataFrame":
        """Drop one column-label level; remaining labels become the
        column names (multiindex.py droplevel)."""
        from pygdf_spark.core.multiindex import MultiIndex

        mi = self.columns_tuples
        if axis != 1 or mi is None:
            raise TypeError("droplevel: only multi-level column labels here")
        dropped = mi.droplevel(level)
        if isinstance(dropped, MultiIndex):
            out = self._with(self._sdf)
            out._col_tuples = dropped
            return out
        names = [str(x) for x in dropped]
        if len(set(names)) != len(names):
            raise ValueError(f"droplevel would create duplicate columns {names}")
        out = self._with(
            self._sdf.withColumnsRenamed(dict(zip(self.columns, names)))
        )
        return out

    # -- search / encode (search.hpp, transform surface) -----------------

    def searchsorted(self, col: str, values: list, side: str = "left") -> list[int]:
        """searchsorted (frame.py:1519, search.hpp lower/upper_bound):
        insertion positions that keep `col` sorted — ONE distributed
        aggregate (a count below each probe), no sort and no collect of
        the column itself."""
        cmp = (lambda v: F.col(col) < F.lit(v)) if side == "left" else (
            lambda v: F.col(col) <= F.lit(v))
        row = self._sdf.agg(
            *[F.sum(cmp(v).cast("long")).alias(f"p{i}") for i, v in enumerate(values)]
        ).collect()[0]
        return [int(row[f"p{i}"] or 0) for i in range(len(values))]

    def factorize(self, col: str):
        """factorize (series surface, labeling.hpp): (codes frame,
        uniques) with codes in first-appearance order. Distributed:
        first-appearance = min(row id) per value, ranked."""
        from pygdf_spark.operators.order import global_row_number

        firsts = self._sdf.groupBy(col).agg(F.min(_RID).alias("__first"))
        # the distinct-value frame can be domain-sized at 100 TB, so the
        # code assignment is the distributed row number, not one task
        codes = global_row_number(firsts, ["__first"], "__code").withColumn(
            "__code", F.col("__code") - 1
        )
        out = self._sdf.join(codes.select(col, "__code"), col, "left").withColumn(
            f"{col}_codes", F.col("__code")
        ).drop("__code", "__first")
        # the codes FRAME stays distributed; only the uniques list is
        # driver-side — guard it (a billion-value domain must go through
        # the distributed code view instead)
        from pygdf_spark.options import check_driver_rows

        check_driver_rows(codes, "factorize (uniques list)")
        uniques = [r[col] for r in codes.orderBy("__code").select(col).collect()]
        return self._with(out.select(_RID, *self.columns, f"{col}_codes")), uniques

    # -- frame-level reductions (dataframe.py reduce surface) ------------

    def _nn(self, c: str):
        """Missing-safe column: NaN (the pandas-interop encoding of
        missing in float columns) → null, so aggregates skip it the way
        pandas/cuDF reductions do."""
        t = dict(self._sdf.dtypes)[c]
        return F.when(~F.isnan(c), F.col(c)) if t in ("double", "float") else F.col(c)

    def _reduce_all(self, fn) -> "pd.Series":
        import pandas as pd

        num = self._numeric_cols()
        row = self._sdf.agg(*[fn(self._nn(c)).alias(c) for c in num]).collect()[0]
        return pd.Series({c: row[c] for c in num})

    def sum(self):
        """frame reductions (dataframe.py:5500+ via Frame._reduce): one
        aggregate pass over every numeric column, host pandas Series out
        (cuDF reductions return host scalars/Series the same way)."""
        return self._reduce_all(F.sum)

    def mean(self):
        return self._reduce_all(F.avg)

    def min(self):
        return self._reduce_all(F.min)

    def max(self):
        return self._reduce_all(F.max)

    def count(self):
        return self._reduce_all(F.count)

    def std(self):
        return self._reduce_all(F.stddev_samp)

    def var(self):
        return self._reduce_all(F.var_samp)

    def median(self):
        return self._reduce_all(F.median)

    def prod(self):
        return self._reduce_all(F.product)

    product = prod

    def quantile(self, q: float = 0.5):
        return self._reduce_all(lambda c: F.percentile(c, F.lit(q)))

    def all(self):
        return self._reduce_all(lambda c: F.bool_and(c.cast("boolean")))

    def any(self):
        return self._reduce_all(lambda c: F.bool_or(c.cast("boolean")))

    def skew(self):
        """sample-adjusted skew per numeric column (pandas/cuDF formula),
        one pass via the Series expression."""
        from pygdf_spark.core.series import Series

        import pandas as pd

        return pd.Series({c: Series(self, c).skew() for c in self._numeric_cols()})

    def kurtosis(self):
        from pygdf_spark.core.series import Series

        import pandas as pd

        return pd.Series({c: Series(self, c).kurtosis() for c in self._numeric_cols()})

    def mode(self):
        """per-column mode (lowest value on ties, cuDF/pandas order)."""
        from pygdf_spark.core.series import Series

        import pandas as pd

        return pd.Series({c: Series(self, c).mode() for c in self._numeric_cols()})

    def agg(self, spec):
        """DataFrame.agg (dataframe.py:5325): dict col → fn(s), one
        aggregate pass, host pandas result."""
        import pandas as pd

        if isinstance(spec, str):
            spec = {c: spec for c in self._numeric_cols()}
        exprs, labels = [], []
        for col, fns in spec.items():
            for fn in [fns] if isinstance(fns, str) else fns:
                exprs.append(_AGG_MAP[fn](self._nn(col)).alias(f"{fn}__{col}"))
                labels.append((fn, col))
        row = self._sdf.agg(*exprs).collect()[0]
        return pd.Series({f"{fn}_{col}": row[f"{fn}__{col}"] for fn, col in labels})

    def corr(self):
        """pairwise Pearson correlation matrix (dataframe.py:7150) — all
        pairs in ONE aggregate pass."""
        return self._pairwise(F.corr)

    def cov(self):
        """pairwise sample covariance (dataframe.py:7210)."""
        return self._pairwise(F.covar_samp)

    def _pairwise(self, fn) -> "pd.DataFrame":
        import pandas as pd

        num = self._numeric_cols()
        exprs = [
            fn(self._nn(a), self._nn(b)).alias(f"{i}__{j}")
            for i, a in enumerate(num) for j, b in enumerate(num) if i <= j
        ]
        row = self._sdf.agg(*exprs).collect()[0]
        mat = [[None] * len(num) for _ in num]
        for i in range(len(num)):
            for j in range(len(num)):
                mat[i][j] = row[f"{min(i, j)}__{max(i, j)}"]
        return pd.DataFrame(mat, index=num, columns=num)

    # -- host converters (io surface; documented small-data) -------------

    def to_dict(self, orient: str = "records"):
        return self.to_pandas().to_dict(orient=orient)

    def to_json(self, path: str | None = None, **kwargs):
        """to_json (io/json.py): with a path, a distributed JSON-lines
        write; without, a host pandas JSON string."""
        if path is None:
            return self.to_pandas().to_json(**kwargs)
        self.spark.write.mode("overwrite").json(path)
        return None

    def to_orc(self, path: str) -> None:
        """write_orc (orc.hpp)."""
        self.spark.write.mode("overwrite").orc(path)

    def to_feather(self, path: str) -> None:
        """to_feather (io/feather.py) — host round-trip via pyarrow."""
        from pygdf_spark.sources.io import write_feather

        write_feather(self.spark, path)

    def to_string(self) -> str:
        return self.to_pandas().to_string()

    def to_records(self):
        return self.to_pandas().to_records(index=False)

    def to_arrow(self):
        """to_arrow (dataframe.py:4950) — Arrow table of the ordered
        rows (Spark's native Arrow collect path)."""
        return self._ordered().drop(_RID).toArrow()

    @property
    def values(self):
        """values (frame.py property) — host numpy matrix."""
        return self.to_pandas().values

    def info(self) -> str:
        """info (dataframe.py method list) — schema + size summary."""
        lines = [f"DataFrame: {len(self.columns)} columns"]
        lines += [f"  {c}: {t}" for c, t in self.dtypes.items()]
        return "\n".join(lines)

    # -- frame-level reductions / summaries ------------------------------

    def nunique(self) -> dict[str, int]:
        """nunique per column (one distributed agg, no collect loops)."""
        row = self._sdf.agg(
            *[F.countDistinct(c).alias(c) for c in self.columns]
        ).collect()[0]
        return row.asDict()

    def value_counts(self, subset: str, dropna: bool = True) -> "DataFrame":
        """value_counts (series.py:5091): counts desc, value asc ties;
        excludes nulls by default (dropna=True, the reference default)."""
        sdf = self._sdf.filter(F.col(subset).isNotNull()) if dropna else self._sdf
        out = (
            sdf.groupBy(subset)
            .agg(F.count(F.lit(1)).alias("count"))
            .orderBy(F.col("count").desc(), F.col(subset).asc_nulls_last())
        )
        return DataFrame(out.withColumn(_RID, F.monotonically_increasing_id()))

    def describe(self) -> "DataFrame":
        """describe (dataframe.py method list): count/mean/std/min/
        25%/50%/75%/max per numeric column, one aggregate pass."""
        num = [c for c, t in self._sdf.dtypes
               if c != _RID and t in ("double", "float", "bigint", "int", "smallint", "tinyint")]
        stats = [
            ("count", lambda c: F.count(c).cast("double")),
            ("mean", F.avg),
            ("std", F.stddev_samp),
            ("min", lambda c: F.min(c).cast("double")),
            ("25%", lambda c: F.percentile(c, F.lit(0.25))),
            ("50%", lambda c: F.percentile(c, F.lit(0.5))),
            ("75%", lambda c: F.percentile(c, F.lit(0.75))),
            ("max", lambda c: F.max(c).cast("double")),
        ]
        agg_row = self._sdf.agg(
            *[fn(c).alias(f"{name}__{c}") for name, fn in stats for c in num]
        ).collect()[0]
        rows = [
            tuple([name] + [agg_row[f"{name}__{c}"] for c in num])
            for name, _ in stats
        ]
        spark = self._sdf.sparkSession
        schema = ", ".join(["statistic string"] + [f"`{c}` double" for c in num])
        return from_spark(spark.createDataFrame(rows, schema=schema))

    # -- sinks (§2.1) ----------------------------------------------------

    def to_parquet(self, path: str, partition_cols: list[str] | None = None) -> None:
        """write_parquet (parquet.hpp:802; partition_cols io/parquet.py:86)."""
        w = self.spark.write.mode("overwrite")
        if partition_cols:
            w = w.partitionBy(*partition_cols)
        w.parquet(path)

    def to_csv(self, path: str, sep: str = ",", header: bool = True) -> None:
        """write_csv (csv.hpp:1452)."""
        self.spark.write.mode("overwrite").option("header", header).option(
            "sep", sep
        ).csv(path)

    # -- UDF surface (§2.11) ---------------------------------------------

    def apply_rows(self, func, schema) -> "DataFrame":
        """apply_rows (dataframe.py:4701 → applyutils numba kernel):
        Arrow-batched pandas kernel with 1:1 row contract."""
        from pygdf_spark.operators.apply import apply_rows as _ar

        return DataFrame(_ar(self.spark, func, schema))

    def apply_chunks(self, func, schema) -> "DataFrame":
        """apply_chunks (dataframe.py:4779): per-Arrow-batch kernel,
        row count may change."""
        from pygdf_spark.operators.apply import apply_chunks as _ac

        return DataFrame(_ac(self.spark, func, schema))

    # -- joins (§2.3, dataframe.py:4365) ---------------------------------

    def merge(self, right: "DataFrame", on=None, how: str = "inner",
              suffixes: tuple[str, str] = ("_x", "_y"),
              left_on=None, right_on=None, indicator: bool = False) -> "DataFrame":
        """merge (dataframe.py:4365 → core/join/join.py:60). Join
        strategy (broadcast/shuffle/sort-merge) is Catalyst's choice.
        ``left_on``/``right_on`` join differently-named keys (both key
        columns survive, as pandas); ``indicator`` adds the _merge
        provenance column ('both'/'left_only'/'right_only')."""
        how = {"outer": "full"}.get(how, how)
        lsdf, rsdf = self._sdf, right._sdf.drop(_RID)
        if left_on is not None or right_on is not None:
            lo = [left_on] if isinstance(left_on, str) else list(left_on)
            ro = [right_on] if isinstance(right_on, str) else list(right_on)
            keyset = set(lo) | set(ro)
        else:
            on = [on] if isinstance(on, str) else list(on)
            lo = ro = on
            keyset = set(on)
        overlap = (set(lsdf.columns) & set(rsdf.columns)) - keyset - {_RID}
        for c in overlap:
            lsdf = lsdf.withColumnRenamed(c, c + suffixes[0])
            rsdf = rsdf.withColumnRenamed(c, c + suffixes[1])
        if indicator:
            lsdf = lsdf.withColumn("__in_l", F.lit(1))
            rsdf = rsdf.withColumn("__in_r", F.lit(1))
        # NULL join keys MATCH each other: the reference joins with
        # null_equality::EQUAL (cpp/include/cudf/join.hpp:73), matching
        # pandas' NaN-key merge behavior — so every key comparison is
        # null-safe (`<=>`, still an equi-join predicate for Catalyst's
        # hash/sort-merge strategies, not a nested-loop fallback).
        if lo is ro or lo == ro:
            rtmp = {k: f"__rk_{k}" for k in lo}
            for k, t in rtmp.items():
                rsdf = rsdf.withColumnRenamed(k, t)
            cond = None
            for k in lo:
                c = lsdf[k].eqNullSafe(rsdf[rtmp[k]])
                cond = c if cond is None else cond & c
            joined = lsdf.join(rsdf, cond, how=how)
            # pandas `on=` emits ONE key column: left value, right-side
            # value for right-only rows of outer/right joins
            for k in lo:
                joined = joined.withColumn(
                    k, F.coalesce(F.col(k), F.col(rtmp[k]))
                ).drop(rtmp[k])
        else:
            cond = None
            for a, b in zip(lo, ro):
                c = lsdf[a].eqNullSafe(rsdf[b])
                cond = c if cond is None else cond & c
            joined = lsdf.join(rsdf, cond, how=how)
        if indicator:
            joined = joined.withColumn(
                "_merge",
                F.when(F.col("__in_l").isNotNull() & F.col("__in_r").isNotNull(), "both")
                .when(F.col("__in_l").isNotNull(), "left_only")
                .otherwise("right_only"),
            ).drop("__in_l", "__in_r")
        # full/right joins emit right-only rows with a NULL left rid; every
        # order-sensitive op downstream (to_pandas, keep=first, head) would
        # see tied null keys. Backfill with unique ids offset past any left
        # rid (monotonically_increasing_id < 2^50 on realistic partition
        # counts, so 2^62 + id cannot collide or overflow) — pandas also
        # orders right-only rows after all left rows.
        joined = joined.withColumn(
            _RID,
            F.coalesce(F.col(_RID), F.lit(1 << 62) + F.monotonically_increasing_id()),
        )
        return self._with(joined)

    # -- groupby (§2.4, dataframe.py:4554) -------------------------------

    def groupby(self, by=None, dropna: bool = True, level=None) -> "GroupBy":
        if level is not None:
            # group by row-index level(s): resolve to the hidden level
            # columns, expose them under their plain names for the agg,
            # and have the result RE-ENCODE them as index levels — the
            # pandas contract (the grouped result keeps the MultiIndex)
            pairs = self._mi_resolve(level)
            sdf = self._sdf
            for phys, plain in pairs:
                sdf = sdf.withColumnRenamed(phys, plain)
            gb = GroupBy(self._with(sdf), [p for _, p in pairs],
                         dropna=dropna)
            gb._mi_restore = [p for _, p in pairs]
            return gb
        if hasattr(by, "key"):  # cudf.Grouper
            by = by.key
        return GroupBy(self, [by] if isinstance(by, str) else list(by), dropna=dropna)


class Rolling:
    """Trailing row-count rolling window (core/window/rolling.py:17,
    rolling.hpp:57): window w ending at the current row, min_periods
    semantics via a conditional on the in-frame count. Frames are over
    the veneer's order column — an explicit global order, exactly the
    ordering cuDF's positional rows imply."""

    def __init__(self, df: DataFrame, window: int, min_periods: int | None):
        self._df = df
        self._n = window
        self._min = window if min_periods is None else min_periods

    def _apply(self, col: str, fn, name: str) -> DataFrame:
        """Distributed: blocked rolling (operators/order.py) — rows are
        bucketed into blocks, each block's last w−1 rows are carried
        into the next block, and every frame evaluates inside a
        block-partitioned window."""
        from pygdf_spark.operators.order import blocked_rolling

        out = blocked_rolling(
            self._df._sdf,
            [_RID],
            [
                (lambda w: fn(col).over(w), "__val"),
                (lambda w: F.count(col).over(w), "__cnt"),
            ],
            self._n,
        )
        return self._df._with(
            out.withColumn(
                f"{col}_roll_{name}",
                F.when(F.col("__cnt") >= self._min, F.col("__val")),
            ).drop("__val", "__cnt")
        )

    def sum(self, col: str) -> DataFrame:
        return self._apply(col, F.sum, "sum")

    def mean(self, col: str) -> DataFrame:
        return self._apply(col, F.avg, "mean")

    def min(self, col: str) -> DataFrame:
        return self._apply(col, F.min, "min")

    def max(self, col: str) -> DataFrame:
        return self._apply(col, F.max, "max")

    def count(self, col: str) -> DataFrame:
        # min_periods gates count too — but on rows *in frame*, not
        # non-null values (pandas counts a full frame of nulls as 0)
        from pygdf_spark.operators.order import blocked_rolling

        out = blocked_rolling(
            self._df._sdf,
            [_RID],
            [
                (lambda w: F.count(col).over(w), "__cnt"),
                (lambda w: F.count(F.lit(1)).over(w), "__in_frame"),
            ],
            self._n,
        )
        return self._df._with(
            out.withColumn(
                f"{col}_roll_count",
                F.when(F.col("__in_frame") >= self._min, F.col("__cnt").cast("double")),
            ).drop("__cnt", "__in_frame")
        )


_AGG_MAP = {
    "sum": F.sum, "mean": F.avg, "min": F.min, "max": F.max,
    "count": F.count, "nunique": F.countDistinct, "std": F.stddev_samp,
    "var": F.var_samp, "median": F.median, "first": F.first, "last": F.last,
    "collect": F.collect_list, "unique": F.collect_set, "product": F.product,
    "any": F.bool_or, "all": F.bool_and,
}


class GroupBy:
    """GroupBy.agg with cuDF's str/list/dict spellings
    (core/groupby/groupby.py:140, _normalize_aggs :193).

    ``dropna=True`` (the reference default, groupby.py:41): rows whose
    group key is null form NO group — aggregations exclude them, and
    transform-shaped ops (shift/cum*/rank/fill) emit null for them
    while keeping the rows, exactly like pandas."""

    def __init__(self, df: DataFrame, keys: list[str], dropna: bool = True):
        self._df = df
        self._keys = keys
        self._dropna = dropna

    def _gsdf(self):
        """Aggregation input: null-key rows removed under dropna."""
        sdf = self._df._sdf
        if self._dropna:
            for k in self._keys:
                sdf = sdf.filter(F.col(k).isNotNull())
        return sdf

    def _mask(self, val):
        """Transform-shaped output: null for null-key rows under dropna."""
        if not self._dropna:
            return val
        cond = None
        for k in self._keys:
            c = F.col(k).isNotNull()
            cond = c if cond is None else cond & c
        return F.when(cond, val)

    def agg(self, spec) -> DataFrame:
        exprs, labels = [], []
        if isinstance(spec, str):
            spec = {c: spec for c in self._df.columns if c not in self._keys}
        multi = isinstance(spec, dict) and any(
            not isinstance(fns, str) for fns in spec.values()
        )
        if isinstance(spec, dict):
            numeric = set(self._df._numeric_cols())
            for col, fns in spec.items():
                for fn in [fns] if isinstance(fns, str) else fns:
                    # pandas/reference missing semantics, per aggregate:
                    # NaN counts as missing (_nn) for reductions;
                    # first/last return the first/last NON-missing value
                    # (pandas GroupBy.first/last); collect/unique keep
                    # raw elements (cuDF list aggregation keeps nulls);
                    # sum/product of an all-missing NUMERIC group take
                    # their identity element, same as GroupBy.sum below
                    if fn in ("collect", "unique"):
                        e = _AGG_MAP[fn](F.col(col))
                    elif fn in ("first", "last"):
                        e = (F.first if fn == "first" else F.last)(
                            self._df._nn(col), ignorenulls=True
                        )
                    else:
                        e = _AGG_MAP[fn](self._df._nn(col))
                        if fn == "sum" and col in numeric:
                            e = F.coalesce(e, F.lit(0))
                        elif fn == "product" and col in numeric:
                            e = F.coalesce(e, F.lit(1))
                    exprs.append(e.alias(f"{fn}_{col}"))
                    labels.append((col, fn))
        else:
            raise TypeError("agg spec must be str or dict")
        out = self._gsdf().groupBy(*self._keys).agg(*exprs)
        res = DataFrame(out.withColumn(_RID, F.monotonically_increasing_id()))
        if multi:
            # cuDF returns two-level column labels for list-valued specs
            # (core/multiindex.py); keys carry an empty second level
            from pygdf_spark.core.multiindex import MultiIndex

            res._col_tuples = MultiIndex(
                [(k, "") for k in self._keys] + labels
            )
        return self._finish(res)

    def _finish(self, res: DataFrame) -> DataFrame:
        """groupby(level=) results keep the row MultiIndex (pandas
        contract): re-encode the key columns as index levels, order
        re-keyed by them."""
        names = getattr(self, "_mi_restore", None)
        if not names:
            return res
        from pygdf_spark.operators.order import rekey_row_id

        sdf = rekey_row_id(
            res._sdf,
            [*[(k, "asc", "nulls_last") for k in names], _RID],
            _RID,
        )
        for i, k in enumerate(names):
            sdf = sdf.withColumnRenamed(k, _mi_phys(i, k))
        out = DataFrame(sdf)
        ct = res.columns_tuples
        if ct is not None:
            # key labels moved into the row index: drop their tuples
            from pygdf_spark.core.multiindex import MultiIndex

            out._col_tuples = MultiIndex(
                [t for t in ct if t[0] not in names], ct.names
            )
        return out

    def size(self) -> DataFrame:
        out = self._gsdf().groupBy(*self._keys).agg(F.count(F.lit(1)).alias("size"))
        return self._finish(
            DataFrame(out.withColumn(_RID, F.monotonically_increasing_id()))
        )

    def apply(self, func, schema) -> DataFrame:
        """GroupBy.apply (groupby.py:384) → applyInPandas."""
        out = self._gsdf().drop(_RID).groupBy(*self._keys).applyInPandas(func, schema=schema)
        return DataFrame(out.withColumn(_RID, F.monotonically_increasing_id()))

    # -- grouped order-sensitive ops (groupby.py:781-902) ----------------
    # All ride Window.partitionBy(keys).orderBy(__row_id): partitioned
    # windows, so they scale across executors (never a global sort).

    def _w(self):
        return Window.partitionBy(*self._keys).orderBy(_RID)

    def shift(self, col: str, periods: int = 1) -> DataFrame:
        """GroupBy.shift (groupby.py:902, groupby::shift groupby.hpp:278)."""
        fn = F.lag(col, periods) if periods >= 0 else F.lead(col, -periods)
        return self._df._with(
            self._df._sdf.withColumn(f"{col}_shift", self._mask(fn.over(self._w())))
        )

    def cumsum(self, col: str) -> DataFrame:
        """group scan (groupby.py:781, groupby::scan groupby.hpp:224)."""
        w = self._w().rowsBetween(Window.unboundedPreceding, 0)
        return self._df._with(
            self._df._sdf.withColumn(
                f"{col}_cumsum",
                self._mask(F.when(self._df._nn(col).isNotNull(),
                                  F.sum(self._df._nn(col)).over(w))),
            )
        )

    def cumcount(self) -> DataFrame:
        """cumcount (groupby.py:120, ROW_NUMBER aggregation.hpp:79)."""
        return self._df._with(
            self._df._sdf.withColumn(
                "cumcount", self._mask(F.row_number().over(self._w()) - 1)
            )
        )

    def ffill(self, col: str) -> DataFrame:
        """pad/ffill (groupby.py:805, groupby::replace_nulls
        groupby.hpp:348): last non-missing at-or-before this row (NaN in
        float columns counts as missing, pandas semantics)."""
        w = self._w().rowsBetween(Window.unboundedPreceding, 0)
        return self._df._with(
            self._df._sdf.withColumn(
                col, self._mask(F.last(self._df._nn(col), ignorenulls=True).over(w))
            )
        )

    def bfill(self, col: str) -> DataFrame:
        """backfill/bfill (groupby.py:821): first non-missing at-or-after."""
        w = self._w().rowsBetween(0, Window.unboundedFollowing)
        return self._df._with(
            self._df._sdf.withColumn(
                col, self._mask(F.first(self._df._nn(col), ignorenulls=True).over(w))
            )
        )

    def rank(self, col: str, method: str = "min", ascending: bool = True,
             na_option: str = "keep") -> DataFrame:
        """per-group rank (frame.py:1459 grouped path); na_option='keep'
        leaves missing values unranked, like the whole-frame rank."""
        v = self._df._nn(col)
        if na_option in ("keep", "bottom"):
            order = v.asc_nulls_last() if ascending else v.desc_nulls_last()
        elif na_option == "top":
            order = v.asc_nulls_first() if ascending else v.desc_nulls_first()
        else:
            raise ValueError(f"na_option={na_option!r}")
        w = Window.partitionBy(*self._keys).orderBy(order)
        fns = {"min": F.rank(), "dense": F.dense_rank(), "first": F.row_number()}
        if method == "average":
            peers = F.count(F.lit(1)).over(
                w.rangeBetween(Window.currentRow, Window.currentRow)
            )
            expr = (2 * F.rank().over(w) + peers - 1) / 2.0
        else:
            expr = fns[method].over(w)
        if na_option == "keep":
            expr = F.when(v.isNotNull(), expr)
        return self._df._with(
            self._df._sdf.withColumn(f"{col}_rank", self._mask(expr.cast("double")))
        )


class _ILoc:
    """Positional row indexer (indexed_frame.py iloc): int, slice, or
    list-of-int over the global row order."""

    def __init__(self, df: DataFrame):
        self._df = df

    def __getitem__(self, key):
        if isinstance(key, int):
            if key < 0:
                tail = self._df.tail(-key)
                return tail.head(1)
            return self._df._with(self._df._ordered().offset(key).limit(1))
        if isinstance(key, slice):
            start, stop, step = key.start or 0, key.stop, key.step or 1
            if step == 1 and start >= 0 and (stop is None or stop >= 0):
                sdf = self._df._ordered().offset(start)
                if stop is not None:
                    sdf = sdf.limit(max(stop - start, 0))
                return self._df._with(sdf)
            idx = list(range(*key.indices(len(self._df))))
            return self._df.take(idx)
        if isinstance(key, Iterable):
            return self._df.take(list(key))
        raise TypeError(f"iloc key {key!r}")


class _Loc:
    """Mask indexer (indexed_frame.py loc): boolean Column, or
    (mask, columns) — the veneer's index is positional, so integer keys
    behave like iloc."""

    def __init__(self, df: DataFrame):
        self._df = df

    @staticmethod
    def _key_compat(v, t: str) -> bool:
        """Is scalar ``v`` type-compatible with Spark dtype ``t``? Used
        to disambiguate a multi-level row key from the pandas
        df.loc[row_key, column_label] form (r3 advice: an all-scalar
        2-tuple was always read as a 2-level row key, so the column
        label got filtered against the second key column)."""
        if t in ("string", "varchar"):
            return isinstance(v, str)
        if t in ("tinyint", "smallint", "int", "bigint"):
            return isinstance(v, int) and not isinstance(v, bool)
        if t in ("float", "double") or t.startswith("decimal"):
            return isinstance(v, (int, float)) and not isinstance(v, bool)
        if t == "boolean":
            return isinstance(v, bool)
        if t.startswith("timestamp") or t == "date":
            return hasattr(v, "year")
        return True

    def __getitem__(self, key):
        if isinstance(key, tuple):
            # multi-level row lookup on a grouped output: a tuple of
            # SCALAR key values (pandas df.loc[("A", 5)]) — distinct
            # from the (mask, columns) form whose first element is a
            # Column / list / slice, and from df.loc[row_key, col_label]
            # whose LAST element names a column
            mi = self._df.columns_tuples
            scalars = not any(isinstance(k, (Column, list, slice)) for k in key)
            if (
                mi is not None
                and scalars
                and len(key) <= len(self._df._mi_key_cols())
            ):
                # pandas precedence (r4 advice): a key-compatible tuple
                # is a (multi-level) ROW key first, even when its last
                # element collides with a column label
                types = dict(self._df._sdf.dtypes)
                kc = self._df._mi_key_cols()[: len(key)]
                if all(
                    self._key_compat(v, types.get(c, "")) for v, c in zip(key, kc)
                ):
                    return self._df.xs(key, axis=0)
            if mi is not None and scalars and len(key) == 2:
                labels = set(self._df.columns) | set(tuple(t) for t in mi)
                if key[1] in labels:
                    # pandas df.loc[row_key, column_label]: row-xs on
                    # the leading key level(s), then the column
                    row_key = key[0] if isinstance(key[0], tuple) else (key[0],)
                    return self._df.xs(row_key, axis=0, drop_level=False)[key[1]]
            mask, cols = key
            out = self._df[mask] if isinstance(mask, Column) else _ILoc(self._df)[mask]
            return out[[cols] if isinstance(cols, str) else list(cols)]
        if isinstance(key, Column):
            return self._df[key]
        return _ILoc(self._df)[key]


def _gb_reduce(fn):
    """Direct GroupBy reductions (groupby.py:sum/mean/... surface): one
    grouped aggregate over every non-key numeric column."""

    def method(self: "GroupBy") -> DataFrame:
        cols = [c for c in self._df._numeric_cols() if c not in self._keys]
        out = self._gsdf().groupBy(*self._keys).agg(
            *[fn(self._df._nn(c)).alias(c) for c in cols]
        )
        return DataFrame(out.withColumn(_RID, F.monotonically_increasing_id()))

    return method


class _GroupedRolling:
    """Grouped rolling (groupby.rolling → per-group trailing frames):
    partitioned windows, so every group's scan runs where its rows live."""

    def __init__(self, gb: "GroupBy", window: int, min_periods: int | None):
        self._gb = gb
        self._n = window
        self._min = window if min_periods is None else min_periods

    def _apply(self, col: str, fn, name: str) -> DataFrame:
        w = (
            Window.partitionBy(*self._gb._keys)
            .orderBy(_RID)
            .rowsBetween(-(self._n - 1), 0)
        )
        val = fn(col).over(w)
        cnt = F.count(col).over(w)
        return self._gb._df._with(
            self._gb._df._sdf.withColumn(
                f"{col}_roll_{name}", self._gb._mask(F.when(cnt >= self._min, val))
            )
        )

    def sum(self, col: str) -> DataFrame:
        return self._apply(col, F.sum, "sum")

    def mean(self, col: str) -> DataFrame:
        return self._apply(col, F.avg, "mean")

    def min(self, col: str) -> DataFrame:
        return self._apply(col, F.min, "min")

    def max(self, col: str) -> DataFrame:
        return self._apply(col, F.max, "max")


def _extend_groupby():
    """GroupBy parity batch (groupby.py method list): reductions,
    positional picks, fills, and host summaries."""

    # pandas identity elements: sum of an all-missing group is 0,
    # product is 1 (min_count=0 semantics)
    GroupBy.sum = _gb_reduce(lambda c: F.coalesce(F.sum(c), F.lit(0)))
    GroupBy.mean = _gb_reduce(F.avg)
    GroupBy.min = _gb_reduce(F.min)
    GroupBy.max = _gb_reduce(F.max)
    GroupBy.count = _gb_reduce(F.count)
    GroupBy.std = _gb_reduce(F.stddev_samp)
    GroupBy.var = _gb_reduce(F.var_samp)
    GroupBy.median = _gb_reduce(F.median)
    GroupBy.nunique = _gb_reduce(F.countDistinct)
    GroupBy.prod = _gb_reduce(lambda c: F.coalesce(F.product(c), F.lit(1)))

    def quantile(self, q: float = 0.5) -> DataFrame:
        return _gb_reduce(lambda c: F.percentile(c, F.lit(q)))(self)

    def collect(self, col: str) -> DataFrame:
        """collect (groupby.py list-agg): per-group value list in row
        order (array_agg is order-nondeterministic distributed; sorting
        by the order key pins it)."""
        out = self._gsdf().groupBy(*self._keys).agg(
            F.array_sort(
                F.collect_list(F.struct(_RID, col))
            ).alias("__pairs")
        ).withColumn(col, F.transform("__pairs", lambda p: p[col])).drop("__pairs")
        return DataFrame(out.withColumn(_RID, F.monotonically_increasing_id()))

    def unique(self, col: str) -> DataFrame:
        out = self._gsdf().groupBy(*self._keys).agg(
            F.array_sort(F.collect_set(col)).alias(col)
        )
        return DataFrame(out.withColumn(_RID, F.monotonically_increasing_id()))

    def _idx_pick(self, col: str, ascending: bool, name: str) -> DataFrame:
        """ARGMIN/ARGMAX (groupby.py idxmin/idxmax, aggregation.hpp):
        global row position of the per-group extreme; ties resolve to
        the earliest row (pandas first-occurrence). One partitioned
        window — no collect, no nondeterministic max_by ties."""
        order = F.col(col).asc_nulls_last() if ascending else F.col(col).desc_nulls_last()
        pos = self._df._pos_sdf()
        if self._dropna:
            for k in self._keys:
                pos = pos.filter(F.col(k).isNotNull())
        w = Window.partitionBy(*self._keys).orderBy(order, F.col("__pos"))
        out = (
            pos.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(*self._keys, (F.col("__pos") - 1).alias(f"{col}_{name}"))
        )
        return DataFrame(out.withColumn(_RID, F.monotonically_increasing_id()))

    def idxmax(self, col: str) -> DataFrame:
        return self._idx_pick(col, ascending=False, name="idxmax")

    def idxmin(self, col: str) -> DataFrame:
        return self._idx_pick(col, ascending=True, name="idxmin")

    def nth(self, n: int) -> DataFrame:
        """nth (groupby.py:684): the n-th row of each group in row
        order (negative counts from the end)."""
        if n >= 0:
            w = Window.partitionBy(*self._keys).orderBy(_RID)
            k = n + 1
        else:
            w = Window.partitionBy(*self._keys).orderBy(F.col(_RID).desc())
            k = -n
        return self._df._with(
            self._gsdf().withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == k)
            .drop("__rn")
        )

    def fillna(self, value=None, method: str | None = None, col: str | None = None) -> DataFrame:
        """fillna (groupby.py:838): scalar fill, or method='ffill'/
        'bfill' within the group."""
        if method == "ffill":
            return self.ffill(col)
        if method == "bfill":
            return self.bfill(col)
        return self._df._with(self._df._sdf.na.fill(value))

    def describe(self, col: str) -> DataFrame:
        """describe (groupby.py:517): count/mean/std/min/25/50/75/max of
        one column per group — a single grouped aggregate."""
        out = self._gsdf().groupBy(*self._keys).agg(
            F.count(col).cast("double").alias("count"),
            F.avg(col).alias("mean"),
            F.stddev_samp(col).alias("std"),
            F.min(col).cast("double").alias("min"),
            F.percentile(col, F.lit(0.25)).alias("25%"),
            F.percentile(col, F.lit(0.5)).alias("50%"),
            F.percentile(col, F.lit(0.75)).alias("75%"),
            F.max(col).cast("double").alias("max"),
        )
        return DataFrame(out.withColumn(_RID, F.monotonically_increasing_id()))

    def pipe(self, func, *args, **kwargs):
        return func(self, *args, **kwargs)

    def keys(self) -> list[str]:
        return list(self._keys)

    @property
    def groups(self) -> dict:
        """groups (host, small-data): key → list of global row
        positions, like pandas' index lists."""
        pos = self._df._pos_sdf()
        if self._dropna:
            for k in self._keys:
                pos = pos.filter(F.col(k).isNotNull())
        rows = pos.groupBy(*self._keys).agg(
            F.sort_array(F.collect_list(F.col("__pos") - 1)).alias("__idx")
        ).collect()
        def key_of(r):
            vals = tuple(r[k] for k in self._keys)
            return vals[0] if len(vals) == 1 else vals
        return {key_of(r): list(r["__idx"]) for r in rows}

    def rolling(self, window: int, min_periods: int | None = None) -> _GroupedRolling:
        """grouped rolling (groupby.py rolling surface)."""
        return _GroupedRolling(self, window, min_periods)

    def cummax(self, col: str) -> DataFrame:
        w = Window.partitionBy(*self._keys).orderBy(_RID).rowsBetween(
            Window.unboundedPreceding, 0
        )
        return self._df._with(
            self._df._sdf.withColumn(
                f"{col}_cummax",
                self._mask(F.when(self._df._nn(col).isNotNull(),
                                  F.max(self._df._nn(col)).over(w))),
            )
        )

    def cummin(self, col: str) -> DataFrame:
        w = Window.partitionBy(*self._keys).orderBy(_RID).rowsBetween(
            Window.unboundedPreceding, 0
        )
        return self._df._with(
            self._df._sdf.withColumn(
                f"{col}_cummin",
                self._mask(F.when(self._df._nn(col).isNotNull(),
                                  F.min(self._df._nn(col)).over(w))),
            )
        )

    GroupBy.quantile = quantile
    GroupBy.collect = collect
    GroupBy.unique = unique
    GroupBy._idx_pick = _idx_pick
    GroupBy.idxmax = idxmax
    GroupBy.idxmin = idxmin
    GroupBy.nth = nth
    GroupBy.fillna = fillna
    GroupBy.describe = describe
    GroupBy.pipe = pipe
    GroupBy.keys = keys
    GroupBy.groups = groups
    GroupBy.rolling = rolling
    GroupBy.cummax = cummax
    GroupBy.cummin = cummin
    GroupBy.aggregate = GroupBy.agg
    GroupBy.pad = GroupBy.ffill
    GroupBy.backfill = GroupBy.bfill
    GroupBy.apply_grouped = GroupBy.apply


_extend_groupby()


def _extend_dataframe_aliases():
    """Alias / interop parity batch (pandas-style alternate spellings and
    the host-iteration surface; GPU-buffer APIs raise with guidance)."""

    DataFrame.isna = DataFrame.isnull
    DataFrame.notna = DataFrame.notnull
    DataFrame.kurt = DataFrame.kurtosis
    DataFrame.div = DataFrame.truediv
    DataFrame.rdiv = DataFrame.rtruediv
    DataFrame.values_host = DataFrame.values
    DataFrame.hash_columns = DataFrame.hash_values
    DataFrame.quantiles = DataFrame.quantile

    def tolist(self) -> list:
        return self.to_pandas().values.tolist()

    def append(self, other: "DataFrame") -> "DataFrame":
        """append (dataframe.py:6310) — row concat, other's rows after
        ours (order keys re-derived)."""
        from pygdf_spark.operators.order import global_row_number

        a = self._pos_sdf().withColumn("__src", F.lit(0))
        b = other._pos_sdf().withColumn("__src", F.lit(1))
        u = a.unionByName(b, allowMissingColumns=True)
        out = (
            global_row_number(u, ["__src", "__pos"], _RID)
            .drop("__src", "__pos")
        )
        return DataFrame(out)

    def argsort(self, col: str, ascending: bool = True) -> list:
        """argsort (frame.py:1425): row positions that would sort `col`
        (host list, like cuDF's returned column materialized)."""
        from pygdf_spark.options import check_driver_rows

        pos = self._pos_sdf()
        check_driver_rows(pos, "argsort")
        order = F.col(col).asc_nulls_last() if ascending else F.col(col).desc_nulls_last()
        rows = pos.orderBy(order, F.col("__pos")).select("__pos").collect()
        return [r["__pos"] - 1 for r in rows]

    def iterrows(self):
        """iterrows (host iteration, small-data — cuDF itself warns these
        are slow paths)."""
        for i, row in self.to_pandas().iterrows():
            yield i, row

    def itertuples(self):
        return self.to_pandas().itertuples()

    def items(self):
        for c in self.columns:
            yield c, self.to_pandas()[c]

    iteritems = items

    @property
    def at(self):
        return _At(self)

    iat = at

    @property
    def index(self) -> range:
        """index (RangeIndex analog): positions 0..n-1."""
        return range(len(self))

    @property
    def name(self):
        return None

    def _unary_all(self, fn) -> "DataFrame":
        sdf = self._sdf
        for c in self._numeric_cols():
            sdf = sdf.withColumn(c, fn(F.col(c)))
        return self._with(sdf)

    def sin(self):
        """frame-wide unary math (cpp unary.hpp; dataframe.py trig
        surface) — every numeric column through the JVM expression."""
        return self._unary_all(F.sin)

    def cos(self):
        return self._unary_all(F.cos)

    def tan(self):
        return self._unary_all(F.tan)

    def asin(self):
        return self._unary_all(F.asin)

    def acos(self):
        return self._unary_all(F.acos)

    def atan(self):
        return self._unary_all(F.atan)

    def exp(self):
        return self._unary_all(F.exp)

    def log(self):
        return self._unary_all(F.log)

    def sqrt(self):
        return self._unary_all(F.sqrt)

    def reindex(
        self,
        labels=None,
        index=None,
        columns=None,
        axis=0,
        copy: bool = True,
        fill_value=None,
    ) -> "DataFrame":
        """reindex (cudf dataframe.py:2754, tests test_dataframe_reindex_0-4):
        conform to new row positions (axis 0 — missing/out-of-range
        positions become NULL rows, duplicates duplicate, pandas
        semantics) and/or a new column list (axis 1 — missing labels
        become null float64 columns, matching pandas' NaN fill).

        Scale shape: the label list is a bounded driver-side artifact
        (cuDF holds it on host too); it joins against the distributed
        row numbers on the position key — the data side never
        collects."""
        if labels is not None:
            if axis in (1, "columns"):
                columns = labels
            else:
                index = labels
        out = self
        if index is not None:
            idx = [int(p) for p in index]
            spark = self._sdf.sparkSession
            order = spark.createDataFrame(
                [(i + 1, p) for i, p in enumerate(idx)], "__ord long, __pos long"
            )
            pos = self._pos_sdf().withColumn("__pos", F.col("__pos") - 1)
            joined = order.join(pos, "__pos", "left").drop("__pos")
            out = self._with(
                joined.withColumn(_RID, F.col("__ord")).drop("__ord")
            )
        if columns is not None:
            existing = set(out.columns)
            # None -> typed NaN column (pandas fills new labels as
            # float64 NaN); a concrete fill_value keeps its own type
            fill = (F.lit(None).cast("double") if fill_value is None
                    else F.lit(fill_value))
            sel = [
                F.col(c).alias(c) if c in existing else fill.alias(c)
                for c in columns
            ]
            out = out._with(out._sdf.select(_RID, *sel))
        return out if (index is not None or columns is not None) else self._with(self._sdf)

    @property
    def is_unique(self) -> bool:
        return self._sdf.drop(_RID).distinct().count() == len(self)

    @property
    def is_monotonic_increasing(self) -> bool:
        from pygdf_spark.core.series import Series

        return all(Series(self, c).is_monotonic_increasing for c in self.columns)

    @property
    def is_monotonic_decreasing(self) -> bool:
        from pygdf_spark.core.series import Series

        return all(Series(self, c).is_monotonic_decreasing for c in self.columns)

    @property
    def is_monotonic(self) -> bool:
        return self.is_monotonic_increasing

    def to_hdf(self, path: str, key: str = "df") -> None:
        """to_hdf (io/hdf.py) — host round-trip, gated on PyTables like
        read_hdf."""
        try:
            import tables  # noqa: F401
        except ImportError as e:
            raise RuntimeError(
                "to_hdf needs PyTables (pip install tables); HDF5 is a "
                "host-only interop format here, as in the reference"
            ) from e
        self.to_pandas().to_hdf(path, key=key)

    def _gpu_only(name: str):
        def method(self, *a, **k):
            raise NotImplementedError(
                f"{name} exchanges raw GPU device buffers (DLPack/CUDA "
                "array interface) — out of scope for a JVM/Arrow engine; "
                "use to_arrow()/to_pandas() for zero-copy-adjacent interop"
            )
        return method

    for _n in ("to_dlpack", "to_gpu_array", "as_gpu_matrix", "as_matrix",
               "serialize", "deserialize"):
        setattr(DataFrame, _n, _gpu_only(_n))

    DataFrame.tolist = tolist
    DataFrame.to_list = tolist
    DataFrame.append = append
    DataFrame.argsort = argsort
    DataFrame.iterrows = iterrows
    DataFrame.itertuples = itertuples
    DataFrame.items = items
    DataFrame.iteritems = items
    DataFrame.at = at
    DataFrame.iat = at
    DataFrame.index = index
    DataFrame.name = name
    DataFrame._unary_all = _unary_all
    DataFrame.sin = sin
    DataFrame.cos = cos
    DataFrame.tan = tan
    DataFrame.asin = asin
    DataFrame.acos = acos
    DataFrame.atan = atan
    DataFrame.exp = exp
    DataFrame.log = log
    DataFrame.sqrt = sqrt
    DataFrame.reindex = reindex
    DataFrame.is_unique = is_unique
    DataFrame.is_monotonic_increasing = is_monotonic_increasing
    DataFrame.is_monotonic_decreasing = is_monotonic_decreasing
    DataFrame.is_monotonic = is_monotonic
    DataFrame.to_hdf = to_hdf


class _At:
    """Single-cell host lookup (indexed_frame at/iat): df.at[row, col]."""

    def __init__(self, df: DataFrame):
        self._df = df

    def __getitem__(self, key):
        row, col = key
        got = _ILoc(self._df)[int(row)].to_pandas()
        return got[col].iloc[0]


_extend_dataframe_aliases()


def from_pandas(spark, pdf) -> DataFrame:
    """cudf.from_pandas analog (needs the SparkSession for ingest).
    Empty frames carry their schema through the pandas dtypes (Spark's
    sampler has no rows to infer from; cuDF ingests empty typed frames
    fine, so the veneer must too — object dtype maps to string)."""
    if len(pdf) == 0:
        from pyspark.sql.types import StructField, StructType, _parse_datatype_string

        _MAP = {
            "int8": "tinyint", "int16": "smallint", "int32": "int",
            "int64": "long", "Int8": "tinyint", "Int16": "smallint",
            "Int32": "int", "Int64": "long", "uint8": "smallint",
            "uint16": "int", "uint32": "long",
            # uint64 → long, matching what the non-empty ingest path
            # infers (values ≥ 2^63 are unsupported through from_pandas
            # either way; decimal(20,0) here would give empty and
            # non-empty frames incompatible schemas)
            "uint64": "long",
            "float32": "float", "float64": "double",
            "Float32": "float", "Float64": "double",
            "bool": "boolean", "boolean": "boolean",
            "object": "string", "string": "string",
        }

        def _t(dt):
            s = str(dt)
            if s == "category":
                # map via the categories' value dtype: the non-empty
                # ingest path infers e.g. long for numeric categories, so
                # hardcoding string would give empty and non-empty frames
                # of the same pandas dtype incompatible schemas
                return _t(dt.categories.dtype)
            if s.startswith("datetime64"):
                return "timestamp"
            if s.startswith("timedelta64"):
                return "interval day to second"
            return _MAP.get(s, "string")

        schema = StructType(
            [
                StructField(str(c), _parse_datatype_string(_t(dt)), True)
                for c, dt in pdf.dtypes.items()
            ]
        )
        return from_spark(spark.createDataFrame([], schema=schema))
    sdf = spark.createDataFrame(pdf)
    # an all-None object column infers as NullType, on which joins and
    # comparisons silently return nothing (cuDF types it as its column
    # dtype; pandas merge matches None keys) — surface it as string
    from pyspark.sql.types import NullType

    for f in sdf.schema.fields:
        if isinstance(f.dataType, NullType):
            sdf = sdf.withColumn(f.name, sdf[f.name].cast("string"))
    return from_spark(sdf)


def from_arrow(spark, table) -> DataFrame:
    """cudf.DataFrame.from_arrow analog — Arrow table → distributed
    frame (via the session's Arrow ingest path)."""
    return from_spark(spark.createDataFrame(table.to_pandas()))


def from_records(spark, records, columns: list[str] | None = None) -> DataFrame:
    """cudf.DataFrame.from_records analog (dataframe.py from_records):
    accepts a numpy structured/record array (columns from dtype names)
    or an iterable of tuples with explicit ``columns``."""
    if columns is None and getattr(getattr(records, "dtype", None), "names", None):
        columns = list(records.dtype.names)
    if columns is None:
        raise TypeError("from_records needs `columns` unless records is a "
                        "numpy structured array")
    rows = [
        tuple(x.item() if hasattr(x, "item") else x for x in r) for r in records
    ]
    return from_spark(spark.createDataFrame(rows, schema=list(columns)))


def _attach_constructors():
    """Constructor call-site parity: cuDF spells these as classmethods
    (DataFrame.from_pandas(pdf)); distributed ingest additionally needs
    the SparkSession, passed first."""

    DataFrame.from_pandas = staticmethod(from_pandas)
    DataFrame.from_arrow = staticmethod(from_arrow)
    DataFrame.from_records = staticmethod(from_records)

    def _gb_gpu(name):
        def method(self, *a, **k):
            raise NotImplementedError(
                f"GroupBy.{name} serializes device groups — out of scope "
                "for a JVM engine; use agg()/apply() results directly"
            )
        return method

    GroupBy.serialize = _gb_gpu("serialize")
    GroupBy.deserialize = _gb_gpu("deserialize")
    GroupBy.values = property(lambda self: self.groups)


_attach_constructors()
