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


def from_spark(sdf: SDF) -> "DataFrame":
    """Wrap a Spark DataFrame, materializing the ingest order."""
    return DataFrame(sdf.withColumn(_RID, F.monotonically_increasing_id()))


class DataFrame:
    """pandas/cuDF-style API over a Spark plan (core/dataframe.py:104)."""

    def __init__(self, sdf: SDF):
        if _RID not in sdf.columns:
            sdf = sdf.withColumn(_RID, F.monotonically_increasing_id())
        self._sdf = sdf

    # -- plumbing -------------------------------------------------------

    @property
    def spark(self) -> SDF:
        """The underlying Spark DataFrame (order column dropped)."""
        return self._sdf.drop(_RID)

    @property
    def columns(self) -> list[str]:
        return [c for c in self._sdf.columns if c != _RID]

    def _with(self, sdf: SDF) -> "DataFrame":
        return DataFrame(sdf)

    def _ordered(self) -> SDF:
        return self._sdf.orderBy(_RID)

    def __len__(self) -> int:
        return self._sdf.count()

    @property
    def shape(self) -> tuple[int, int]:
        return (len(self), len(self.columns))

    def to_pandas(self):
        """Host round-trip (small-data, like cuDF to_pandas)."""
        return self._ordered().drop(_RID).toPandas()

    # -- selection / projection (dataframe.py __getitem__/assign) -------

    def __getitem__(self, key):
        if isinstance(key, str):
            from pygdf_spark.core.series import Series

            return Series(self, key)
        if isinstance(key, Column):  # boolean-mask filter
            return self._with(self._sdf.filter(key))
        if isinstance(key, Iterable):
            return self._with(self._sdf.select(_RID, *list(key)))
        raise TypeError(f"unsupported key {key!r}")

    def assign(self, **kwargs) -> "DataFrame":
        """assign (dataframe.py method list): add/replace columns."""
        sdf = self._sdf
        for name, expr in kwargs.items():
            sdf = sdf.withColumn(name, expr)
        return self._with(sdf)

    def drop(self, columns: list[str] | str) -> "DataFrame":
        cols = [columns] if isinstance(columns, str) else list(columns)
        return self._with(self._sdf.drop(*cols))

    def rename(self, columns: dict[str, str]) -> "DataFrame":
        return self._with(self._sdf.withColumnsRenamed(columns))

    def astype(self, dtypes: dict[str, str]) -> "DataFrame":
        sdf = self._sdf
        for c, t in dtypes.items():
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
        order column to the new sort (stable: old order breaks ties)."""
        by = [by] if isinstance(by, str) else list(by)
        asc = [ascending] * len(by) if isinstance(ascending, bool) else list(ascending)
        keys = []
        for c, a in zip(by, asc):
            col = F.col(c)
            if a:
                keys.append(col.asc_nulls_last() if na_position == "last" else col.asc_nulls_first())
            else:
                keys.append(col.desc_nulls_last() if na_position == "last" else col.desc_nulls_first())
        keys.append(F.col(_RID))  # stability
        w = Window.orderBy(*keys)
        sdf = (
            self._sdf.withColumn("__new_rid", F.row_number().over(w))
            .drop(_RID)
            .withColumnRenamed("__new_rid", _RID)
        )
        return self._with(sdf)

    def head(self, n: int = 5) -> "DataFrame":
        return self._with(self._ordered().limit(n))

    def tail(self, n: int = 5) -> "DataFrame":
        return self._with(self._sdf.orderBy(F.col(_RID).desc()).limit(n))

    def shift(self, col: str, periods: int = 1) -> "DataFrame":
        """Series.shift (frame.py:1644, copying.hpp:375) over the row
        order."""
        w = Window.orderBy(_RID)
        fn = F.lag(col, periods) if periods >= 0 else F.lead(col, -periods)
        return self._with(self._sdf.withColumn(f"{col}_shift", fn.over(w)))

    def cumsum(self, col: str) -> "DataFrame":
        """cumsum (dataframe.py cummethods, reduction.hpp:90 scan)."""
        return self._cum(col, F.sum, "cumsum")

    def cummax(self, col: str) -> "DataFrame":
        return self._cum(col, F.max, "cummax")

    def cummin(self, col: str) -> "DataFrame":
        return self._cum(col, F.min, "cummin")

    def _cum(self, col: str, fn, suffix: str) -> "DataFrame":
        w = Window.orderBy(_RID).rowsBetween(Window.unboundedPreceding, 0)
        return self._with(self._sdf.withColumn(f"{col}_{suffix}", fn(col).over(w)))

    def diff(self, col: str) -> "DataFrame":
        """Series.diff (series.py:5652): c − lag(c) over the row order."""
        w = Window.orderBy(_RID)
        return self._with(
            self._sdf.withColumn(f"{col}_diff", F.col(col) - F.lag(col).over(w))
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
        by ordinal position. Positions are resolved with a row_number
        over the order column (a global window — positional gather is
        inherently order-coupled; cuDF pays the same full-column gather)."""
        w = Window.orderBy(_RID)
        return self._with(
            self._sdf.withColumn("__pos", F.row_number().over(w) - 1)
            .filter(F.col("__pos").isin([int(i) for i in indices]))
            .drop("__pos")
        )

    def sample(self, frac: float, seed: int = 0) -> "DataFrame":
        """sample (frame.py:1785, copying.hpp:913)."""
        return self._with(self._sdf.sample(fraction=frac, seed=seed))

    def explode(self, column: str) -> "DataFrame":
        """explode (dataframe.py:7700, lists/explode.hpp:63): one row per
        list element; order extends (row, element-position)."""
        others = [c for c in self._sdf.columns if c != column]
        sdf = self._sdf.select(
            *others, F.posexplode_outer(column).alias("__p", column)
        )
        w = Window.orderBy(_RID, "__p")
        sdf = (
            sdf.withColumn("__new_rid", F.row_number().over(w))
            .drop(_RID, "__p")
            .withColumnRenamed("__new_rid", _RID)
        )
        return self._with(sdf)

    def interleave_columns(self, columns: list[str], name: str = "value") -> "DataFrame":
        """interleave_columns (frame.py:2450, reshape.hpp:49) — row-major
        interleave of same-dtype columns into one column; order extends
        (row, column-position)."""
        sdf = self._sdf.select(_RID, F.posexplode(F.array(*columns)).alias("__p", name))
        w = Window.orderBy(_RID, "__p")
        sdf = (
            sdf.withColumn("__new_rid", F.row_number().over(w))
            .drop(_RID, "__p")
            .withColumnRenamed("__new_rid", _RID)
        )
        return self._with(sdf)

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
        sdf = self._sdf.unpivot(
            [_RID, *id_vars], value_vars, var_name, value_name
        )
        w = Window.orderBy(var_name, _RID)
        sdf = sdf.withColumn("__new_rid", F.row_number().over(w)).drop(_RID) \
                 .withColumnRenamed("__new_rid", _RID)
        return self._with(sdf)

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

    def rank(self, col: str, method: str = "min", ascending: bool = True) -> "DataFrame":
        """rank (frame.py:1459, sorting.hpp:178) over one column."""
        order = F.col(col).asc() if ascending else F.col(col).desc()
        w = Window.orderBy(order)
        fns = {"min": F.rank(), "dense": F.dense_rank(), "first": F.row_number()}
        if method == "average":
            expr = (F.rank().over(w) + F.rank().over(w) + F.count(F.lit(1)).over(
                w.rangeBetween(Window.currentRow, Window.currentRow)) - 1) / 2.0
        else:
            expr = fns[method].over(w)
        return self._with(self._sdf.withColumn(f"{col}_rank", expr.cast("double")))

    def rolling(self, window: int, min_periods: int | None = None) -> "Rolling":
        """rolling (core/window/rolling.py:17) over the row order."""
        return Rolling(self, window, min_periods)

    # -- frame-level reductions / summaries ------------------------------

    def nunique(self) -> dict[str, int]:
        """nunique per column (one distributed agg, no collect loops)."""
        row = self._sdf.agg(
            *[F.countDistinct(c).alias(c) for c in self.columns]
        ).collect()[0]
        return row.asDict()

    def value_counts(self, subset: str) -> "DataFrame":
        """value_counts (series.py:5091): counts desc, value asc ties."""
        out = (
            self._sdf.groupBy(subset)
            .agg(F.count(F.lit(1)).alias("count"))
            .orderBy(F.col("count").desc(), F.col(subset).asc())
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
              suffixes: tuple[str, str] = ("_x", "_y")) -> "DataFrame":
        """merge (dataframe.py:4365 → core/join/join.py:60). Join
        strategy (broadcast/shuffle/sort-merge) is Catalyst's choice."""
        on = [on] if isinstance(on, str) else list(on)
        lsdf, rsdf = self._sdf, right._sdf.drop(_RID)
        overlap = (set(lsdf.columns) & set(rsdf.columns)) - set(on) - {_RID}
        for c in overlap:
            lsdf = lsdf.withColumnRenamed(c, c + suffixes[0])
            rsdf = rsdf.withColumnRenamed(c, c + suffixes[1])
        joined = lsdf.join(rsdf, on=on, how=how)
        if _RID not in joined.columns:  # right/outer rows lack a left rid
            joined = joined.withColumn(_RID, F.monotonically_increasing_id())
        return self._with(joined)

    # -- groupby (§2.4, dataframe.py:4554) -------------------------------

    def groupby(self, by) -> "GroupBy":
        return GroupBy(self, [by] if isinstance(by, str) else list(by))


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
        w = Window.orderBy(_RID).rowsBetween(-(self._n - 1), 0)
        val = fn(col).over(w)
        cnt = F.count(col).over(w)
        out = F.when(cnt >= self._min, val)
        return self._df._with(
            self._df._sdf.withColumn(f"{col}_roll_{name}", out)
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
        w = Window.orderBy(_RID).rowsBetween(-(self._n - 1), 0)
        cnt = F.count(col).over(w)
        # min_periods gates count too — but on rows *in frame*, not
        # non-null values (pandas counts a full frame of nulls as 0)
        in_frame = F.count(F.lit(1)).over(w)
        return self._df._with(
            self._df._sdf.withColumn(
                f"{col}_roll_count",
                F.when(in_frame >= self._min, cnt.cast("double")),
            )
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
    (core/groupby/groupby.py:140, _normalize_aggs :193)."""

    def __init__(self, df: DataFrame, keys: list[str]):
        self._df = df
        self._keys = keys

    def agg(self, spec) -> DataFrame:
        exprs = []
        if isinstance(spec, str):
            spec = {c: spec for c in self._df.columns if c not in self._keys}
        if isinstance(spec, dict):
            for col, fns in spec.items():
                for fn in [fns] if isinstance(fns, str) else fns:
                    exprs.append(_AGG_MAP[fn](col).alias(f"{fn}_{col}"))
        else:
            raise TypeError("agg spec must be str or dict")
        out = self._df._sdf.groupBy(*self._keys).agg(*exprs)
        return DataFrame(out.withColumn(_RID, F.monotonically_increasing_id()))

    def size(self) -> DataFrame:
        out = self._df._sdf.groupBy(*self._keys).agg(F.count(F.lit(1)).alias("size"))
        return DataFrame(out.withColumn(_RID, F.monotonically_increasing_id()))

    def apply(self, func, schema) -> DataFrame:
        """GroupBy.apply (groupby.py:384) → applyInPandas."""
        out = self._df._sdf.drop(_RID).groupBy(*self._keys).applyInPandas(func, schema=schema)
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
            self._df._sdf.withColumn(f"{col}_shift", fn.over(self._w()))
        )

    def cumsum(self, col: str) -> DataFrame:
        """group scan (groupby.py:781, groupby::scan groupby.hpp:224)."""
        w = self._w().rowsBetween(Window.unboundedPreceding, 0)
        return self._df._with(
            self._df._sdf.withColumn(f"{col}_cumsum", F.sum(col).over(w))
        )

    def cumcount(self) -> DataFrame:
        """cumcount (groupby.py:120, ROW_NUMBER aggregation.hpp:79)."""
        return self._df._with(
            self._df._sdf.withColumn(
                "cumcount", F.row_number().over(self._w()) - 1
            )
        )

    def ffill(self, col: str) -> DataFrame:
        """pad/ffill (groupby.py:805, groupby::replace_nulls
        groupby.hpp:348): last non-null at-or-before this row."""
        w = self._w().rowsBetween(Window.unboundedPreceding, 0)
        return self._df._with(
            self._df._sdf.withColumn(
                col, F.last(col, ignorenulls=True).over(w)
            )
        )

    def bfill(self, col: str) -> DataFrame:
        """backfill/bfill (groupby.py:821): first non-null at-or-after."""
        w = self._w().rowsBetween(0, Window.unboundedFollowing)
        return self._df._with(
            self._df._sdf.withColumn(
                col, F.first(col, ignorenulls=True).over(w)
            )
        )

    def rank(self, col: str, method: str = "min", ascending: bool = True) -> DataFrame:
        """per-group rank (frame.py:1459 grouped path)."""
        order = F.col(col).asc() if ascending else F.col(col).desc()
        w = Window.partitionBy(*self._keys).orderBy(order)
        fns = {"min": F.rank(), "dense": F.dense_rank(), "first": F.row_number()}
        if method == "average":
            peers = F.count(F.lit(1)).over(
                w.rangeBetween(Window.currentRow, Window.currentRow)
            )
            expr = (2 * F.rank().over(w) + peers - 1) / 2.0
        else:
            expr = fns[method].over(w)
        return self._df._with(
            self._df._sdf.withColumn(f"{col}_rank", expr.cast("double"))
        )
