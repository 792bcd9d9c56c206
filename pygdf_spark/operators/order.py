"""Distributed ordering primitives (SURVEY.md §7 row-order discipline;
§2.6 distributed sort — dask_cudf/sorting.py:207's sample→divisions→
shuffle→local-sort).

``Window.orderBy(...)`` with no partition key funnels the whole dataset
through ONE task — correct at test SF, fatal at 100 TB. Everything here
is the explicit three-step instead:

1. **Sample boundaries once, driver-side, into literals.** One count +
   one key-sample job (bounded: ≤ _SAMPLE_CAP key tuples). The bucket
   id then becomes a PURE FUNCTION of row values — a literal
   comparison chain, fully deterministic across every branch and every
   re-evaluation. (Spark's own ``repartitionByRange`` re-samples
   nondeterministically per exchange; two pruning-differentiated
   branches of one plan then disagree on partition ids, which
   corrupted offsets — round-3 lesson. Literal boundaries make the
   whole downstream plan referentially transparent, so no caching, no
   checkpoint, and no reliance on ReuseExchange.)
2. Per-bucket window (parallel — the window's own hash shuffle on the
   bucket id co-locates each bucket).
3. Stitch buckets with bounded metadata: per-bucket totals are reduced
   to ONE row (an n_buckets array), prefix-combined with a single
   array fold, and broadcast-joined back on the bucket id.

Boundary QUALITY affects only load balance, never correctness: every
row strictly-after k boundaries lands in bucket k, ties co-locate by
value. Nothing is persisted — repeated calls accumulate zero cached
partitions (tests/test_edges.py::test_order_primitives_no_cache_…).
At 100 TB, callers chaining many order ops over the same keys should
persist the input once AND reuse one ``sample_boundaries(...)`` result
via each primitive's ``boundaries=`` parameter — otherwise every
primitive re-runs its own sampling scan of the upstream plan.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__pid"
_SAMPLE_CAP = 200_000  # max key tuples collected for boundary sampling
_PER_BUCKET = 64       # sampled keys per target bucket


# null-skipping combiners: combine(a, b) over possibly-null partials,
# used both for the prefix fold across bucket totals and for the final
# local⊕offset application (aggregates skip nulls — reference
# null_policy EXCLUDE)
_COMBINE = {
    "sum": lambda a, b: F.coalesce(a + b, a, b),
    "min": lambda a, b: F.least(a, b),
    "max": lambda a, b: F.greatest(a, b),
    "prod": lambda a, b: F.coalesce(a * b, a, b),
}


def _spec(key) -> tuple:
    """Normalize a key into (expr, asc, nulls_first). Accepts a column
    name / Column (ascending, nulls first — Spark's ASC default) or an
    explicit (expr, 'asc'|'desc', 'nulls_first'|'nulls_last') triple."""
    if isinstance(key, tuple):
        expr, direction, nulls = key
        expr = F.col(expr) if isinstance(expr, str) else expr
        return expr, direction == "asc", nulls == "nulls_first"
    return (F.col(key) if isinstance(key, str) else key), True, True


def _sort_cols(specs) -> list[Column]:
    """The Spark sort-order forms of the MATERIALIZED key columns
    (``__k<i>``) for the per-bucket window ORDER BY."""
    out = []
    for i, (_, asc, nf) in enumerate(specs):
        expr = F.col(f"__k{i}")
        if asc:
            out.append(expr.asc_nulls_first() if nf else expr.asc_nulls_last())
        else:
            out.append(expr.desc_nulls_first() if nf else expr.desc_nulls_last())
    return out


def _is_nan(v) -> bool:
    return isinstance(v, float) and math.isnan(v)


def _cmp_key(row: tuple, specs) -> tuple:
    """Python sort key mirroring the Spark ordering: per column a
    (null_rank, nan_rank, value') triple — nulls placed per the spec
    (independent of direction), NaN greater than every number (Spark
    double ordering, so first under desc), values wrapped in a
    direction-aware comparator."""
    out = []
    for v, (_, asc, nf) in zip(row, specs):
        if v is None:
            out.append((-1 if nf else 1, 0, 0))
        elif _is_nan(v):
            out.append((0, 1 if asc else -1, 0))
        else:
            out.append((0, 0, _Asc(v) if asc else _Desc(v)))
    return tuple(out)


class _Asc:
    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __lt__(self, o):
        return self.v < o.v

    def __eq__(self, o):
        return self.v == o.v


class _Desc:
    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __lt__(self, o):
        return o.v < self.v

    def __eq__(self, o):
        return self.v == o.v


def _sql_lit(v) -> str:
    """Render a sampled key value as a Spark SQL literal."""
    import datetime
    from decimal import Decimal

    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return f"{v}L"
    if isinstance(v, float):
        if math.isnan(v):
            return "CAST('NaN' AS DOUBLE)"
        if math.isinf(v):
            return f"CAST('{'-' if v < 0 else ''}Infinity' AS DOUBLE)"
        return f"CAST({v!r} AS DOUBLE)"
    if isinstance(v, Decimal):
        return f"{v}BD"
    if isinstance(v, str):
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    if isinstance(v, datetime.datetime):
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    if isinstance(v, datetime.date):
        return f"DATE '{v.isoformat()}'"
    raise TypeError(f"unsupported boundary key type {type(v).__name__}")


def _after_sql(specs, boundary: tuple) -> str:
    """SQL predicate: the row's materialized key tuple (``__k<i>``
    columns) sorts STRICTLY AFTER the literal ``boundary`` under the
    spec ordering (lexicographic). Kept minimal — null keys fold into
    IS NULL disjuncts instead of rank CASEs — so the full nested-CASE
    bucket search stays small enough for whole-stage codegen (an
    interpreted fallback here costs ~5x on the scan stage)."""
    res = "FALSE"
    # right-to-left: after = after_0 OR (eq_0 AND (after_1 OR ...))
    for i, ((_, asc, nf), bval) in reversed(list(enumerate(zip(specs, boundary)))):
        c = f"__k{i}"
        if bval is None:
            if nf:  # null boundary sorts first: any non-null is after
                after_i = f"({c} IS NOT NULL)"
            else:  # null boundary sorts last: nothing is after
                after_i = "FALSE"
            eq_i = f"({c} IS NULL)"
        else:
            lit = _sql_lit(bval)
            op = ">" if asc else "<"
            if nf:  # null keys sort before every non-null boundary
                after_i = f"({c} {op} {lit})"  # NULL -> FALSE in CASE ✓
            else:  # null keys sort after everything
                after_i = f"({c} IS NULL OR {c} {op} {lit})"
            eq_i = f"({c} = {lit})"  # NULL -> not equal ✓
        res = f"({after_i} OR ({eq_i} AND {res}))"
    return res


def _bucket_sql(specs, boundaries: list[tuple]) -> str:
    """Bucket id = number of boundaries the key sorts strictly after,
    found by a BINARY SEARCH rendered as a nested CASE (depth log2 n,
    ~log2(n) lexicographic compares per row; one compact SQL string so
    plan construction is one call and codegen methods stay small)."""
    if not boundaries:
        return "0"

    def go(lo: int, hi: int) -> str:
        # bucket known to lie in [lo, hi]
        if lo == hi:
            return str(lo)
        mid = (lo + hi) // 2
        return (
            f"(CASE WHEN {_after_sql(specs, boundaries[mid])} "
            f"THEN {go(mid + 1, hi)} ELSE {go(lo, mid)} END)"
        )

    return go(0, len(boundaries))


def _bucket_udf_col(specs, boundaries: list[tuple], ktypes) -> Column:
    """Bucket id via a VECTORIZED binary search in one scalar pandas
    UDF — the large-boundary path (r3 advice: the former CASE-thinning
    capped buckets at ~tens because the inlined search had to fit the
    codegen budget; here ALL sampled boundaries are kept, so bucket
    count — and thus window parallelism — scales with the data).

    Exactness without Arrow fidelity traps: every key reaching this
    point is already a primitive (ints/doubles/strings — _work_frame
    re-encodes decimal/timestamp/date/boolean keys to integers), and
    the UDF inputs are NULL-FREE pairs per key:

    - ``rank``: tinyint folding null placement and NaN ordering into
      one value (null_rank*2 + nan_rank: nulls ±2 per nulls_first/
      nulls_last, NaN ±1 per asc/desc, plain values 0) — so Arrow
      never sees a null int64 (which pandas would widen to float64,
      losing >2^53 precision) and never sees a NaN that means NULL;
    - ``val``: the key with null/NaN replaced by a constant (unused:
      value ordering only applies between rank-0 entries).

    The numpy search runs log2(n) fancy-indexed vector compares per
    batch (~100ns/row measured incl. Arrow transfer), Arrow-batched
    and parallel across Python workers. Pure function of row values →
    deterministic across re-evaluations, like the literal CASE. No SQL
    text anywhere, so legacy escapedStringLiterals sessions are safe
    (the second r3 advice finding)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import IntegerType

    k = len(specs)
    nb = len(boundaries)

    def enc_rank(v, asc, nf):
        if v is None:
            return (-2 if nf else 2)
        if _is_nan(v):
            return (1 if asc else -1)
        return 0

    repl = [0 if t not in ("string",) else "" for t in ktypes]
    b_rank, b_val, dirs = [], [], []
    for i, (_, asc, nf) in enumerate(specs):
        b_rank.append(
            np.array([enc_rank(b[i], asc, nf) for b in boundaries], dtype=np.int8)
        )
        vals = [repl[i] if (b[i] is None or _is_nan(b[i])) else b[i] for b in boundaries]
        if ktypes[i] == "string":
            b_val.append(np.array(vals, dtype=object))
        elif ktypes[i] in ("float", "double"):
            b_val.append(np.array(vals, dtype=np.float64))
        else:
            try:
                b_val.append(np.array(vals, dtype=np.int64))
            except OverflowError:
                # decimal(>18) keys are not re-encoded by _work_frame —
                # object dtype keeps exact Python-int/Decimal compares
                # (slower, but bucket assignment must be exact: a wrong
                # bucket breaks global order, not just load balance)
                b_val.append(np.array(vals, dtype=object))
        dirs.append(asc)
    steps = max(1, math.ceil(math.log2(nb + 1)))

    def _search(*cols):
        m = len(cols[0])
        ranks = [cols[2 * i].to_numpy() for i in range(k)]
        vals = [
            cols[2 * i + 1].to_numpy()
            if ktypes[i] != "string"
            else cols[2 * i + 1].to_numpy(dtype=object)
            for i in range(k)
        ]
        lo = np.zeros(m, dtype=np.int64)
        hi = np.full(m, nb, dtype=np.int64)
        for _ in range(steps):
            live = lo < hi
            # rows already converged to the last bucket have lo==hi==nb;
            # clamp their (dead) mid so the boundary fancy-index stays in
            # bounds — `live` masks them out of the lo/hi updates anyway
            mid = np.minimum((lo + hi) // 2, nb - 1)
            res = np.zeros(m, dtype=bool)
            for i in reversed(range(k)):
                br = b_rank[i][mid]
                bv = b_val[i][mid]
                rr, rv = ranks[i], vals[i]
                gt = (rv > bv) if dirs[i] else (rv < bv)
                after_i = (rr > br) | ((rr == br) & (rr == 0) & gt)
                eq_i = (rr == br) & ((rr != 0) | (rv == bv))
                res = after_i | (eq_i & res)
            lo = np.where(live & res, mid + 1, lo)
            hi = np.where(live & ~res, mid, hi)
        return pd.Series(lo.astype(np.int32))

    # no type hints: pandas_udf's hint inference rejects *args
    # signatures — the explicit returnType form infers SCALAR eval
    search = F.pandas_udf(_search, IntegerType())

    args = []
    for i, (_, asc, nf) in enumerate(specs):
        key = F.col(f"__k{i}")
        if ktypes[i] in ("float", "double"):
            rank = (
                F.when(key.isNull(), F.lit(-2 if nf else 2))
                .when(F.isnan(key), F.lit(1 if asc else -1))
                .otherwise(F.lit(0))
            )
            val = F.when(key.isNull() | F.isnan(key), F.lit(0.0)).otherwise(key)
        else:
            rank = F.when(key.isNull(), F.lit(-2 if nf else 2)).otherwise(F.lit(0))
            val = F.coalesce(key, F.lit(repl[i]))
        args += [rank.cast("tinyint"), val]
    return search(*args)


def _boundaries(keys_df: DataFrame, specs, num_partitions: int) -> list[tuple]:
    """Sample the key distribution and pick ``num_partitions − 1``
    evenly spaced split points (driver footprint ≤ _SAMPLE_CAP tuples).
    Boundary quality is a load-balance concern only."""
    if num_partitions <= 1:
        return []
    target = min(_SAMPLE_CAP, max(num_partitions * _PER_BUCKET, 1024))
    # one sampling scan (no count pass): a 1% sample capped PER INPUT
    # PARTITION — `.limit(target)` would CollectLimit from a prefix of
    # partitions, so key-clustered input (data stored in key order, the
    # timestamp norm) would yield boundaries covering only the earliest
    # keys and funnel the bulk into one bucket. The per-partition
    # row_number window is parallel; the collect is bounded by
    # cap × n_input_partitions ≈ target (± partition-fill skew).
    sampled = keys_df.sample(withReplacement=False, fraction=0.01, seed=17)
    n_in = max(keys_df.rdd.getNumPartitions(), 1)
    cap = max(1, -(-target // n_in))  # ceil
    sn = F.row_number().over(
        Window.partitionBy(F.spark_partition_id())
        .orderBy(F.monotonically_increasing_id())
    )
    rows = (
        sampled.withColumn("__sn", sn)
        .filter(F.col("__sn") <= cap)
        .drop("__sn")
        .collect()
    )
    if len(rows) > target:  # fill skew: thin evenly, keep spread
        step = len(rows) / target
        rows = [rows[int(i * step)] for i in range(target)]
    if len(rows) < max(8 * num_partitions, 64):
        rows = keys_df.limit(_SAMPLE_CAP).collect()
    if not rows:
        return []
    sample = sorted((tuple(r) for r in rows), key=lambda t: _cmp_key(t, specs))
    n = len(sample)
    step = n / num_partitions
    out, seen = [], set()
    for i in range(1, num_partitions):
        b = sample[min(n - 1, int(i * step))]
        marker = tuple(repr(x) for x in b)
        if marker not in seen:  # dedup equal split points
            seen.add(marker)
            out.append(b)
    return out


def _bucketed(
    df: DataFrame,
    keys: list,
    num_partitions: int | None = None,
    boundaries: list[tuple] | None = None,
):
    """(df + materialized ``__k<i>`` key columns + deterministic
    ``__pid`` bucket column, specs, helper-column names). The window
    shuffle on ``__pid`` does the co-location; no separate repartition.
    Callers drop the helpers from their final projection.

    ``boundaries``: precomputed split points (from sample_boundaries)
    — pass them when composing several order primitives over the same
    keys so the input plan isn't re-sampled per call (r3 advice: each
    primitive otherwise runs its own boundary-sampling collect, which
    re-executes the upstream plan).

    Bucket-id strategy is hybrid:
    - small boundary sets → one inlined nested-CASE binary search
      (pure whole-stage codegen; HotSpot never JIT-compiles methods
      over ~8000 bytecodes / ~3800 SQL chars, measured 5x cliff);
    - larger sets (multi-key / string keys) → a vectorized numpy
      binary search in one Arrow-batched pandas UDF
      (_bucket_udf_col): generated-code size is constant, so ALL
      sampled boundaries are kept and bucket count scales with the
      data — no parallelism cap. Also the only path used under legacy
      spark.sql.parser.escapedStringLiterals=true sessions, where
      _sql_lit's backslash escaping would be misparsed (the UDF path
      has no SQL text).
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    work, specs, knames = _work_frame(df, keys)
    bounds = (
        boundaries
        if boundaries is not None
        else _boundaries(work.select(*knames), specs, n)
    )
    if not bounds:
        pid: Column = F.lit(0)
    else:
        legacy_parser = (
            str(
                df.sparkSession.conf.get(
                    "spark.sql.parser.escapedStringLiterals", "false"
                )
            ).lower()
            == "true"
        )
        sql = None if legacy_parser else _bucket_sql(specs, bounds)
        if sql is not None and len(sql) <= 3_800:
            pid = F.expr(sql)
        else:
            ktypes = [t for _, t in work.select(*knames).dtypes]
            pid = _bucket_udf_col(specs, bounds, ktypes)
    parted = work.withColumn(_PID, pid.cast("int"))
    return parted, specs, knames


def _work_frame(df: DataFrame, keys: list):
    """df + materialized ``__k<i>`` key columns (decimal keys
    order-preserving re-encoded as the unscaled BIGINT — precision ≤ 18
    always fits; Decimal compares are ~5x slower than long compares and
    the bucket search does O(log n) of them per row, measured
    1.75s → 0.4s on a 600k-row decimal sort key)."""
    import re

    specs = [_spec(k) for k in keys]
    kcols = [expr.alias(f"__k{i}") for i, (expr, _, _) in enumerate(specs)]
    work = df.select("*", *kcols)
    knames = [f"__k{i}" for i in range(len(specs))]
    retyped = []
    for name, t in work.select(*knames).dtypes:
        m = re.fullmatch(r"decimal\((\d+),(\d+)\)", t)
        if m and int(m.group(1)) <= 18:
            retyped.append(F.expr(f"CAST({name} * {10 ** int(m.group(2))} AS BIGINT)").alias(name))
        elif t == "timestamp_ntz":
            # unix_micros only takes TIMESTAMP, and CAST(ntz AS
            # TIMESTAMP) routes through the session timezone (non-
            # monotone around DST gaps) — build the µs integer from the
            # tz-free wall-clock parts instead
            c = F.col(name)
            micros = (
                F.unix_date(c.cast("date")).cast("long") * F.lit(86_400_000_000)
                + F.hour(c).cast("long") * F.lit(3_600_000_000)
                + F.minute(c).cast("long") * F.lit(60_000_000)
                + F.round(F.expr(f"date_part('SECOND', {name})") * 1_000_000, 0).cast("long")
            )
            retyped.append(micros.alias(name))
        elif t.startswith("timestamp"):
            # order-preserving µs integer: long compares beat timestamp
            # compares in the bucket search, and the UDF path then only
            # ever sees primitive types (no tz/unit pitfalls)
            retyped.append(F.unix_micros(F.col(name)).alias(name))
        elif t == "date":
            retyped.append(F.datediff(F.col(name), F.lit("1970-01-01")).alias(name))
        elif t == "boolean":
            retyped.append(F.col(name).cast("int").alias(name))
        else:
            retyped.append(F.col(name))
    work = work.select(*[c for c in work.columns if c not in knames], *retyped)
    return work, specs, knames


def sample_boundaries(
    df: DataFrame, keys: list, num_partitions: int | None = None
) -> list[tuple]:
    """Public boundary sampling for callers chaining several order
    primitives over the SAME keys: sample once (ideally over a
    persisted input), pass the result to each primitive's
    ``boundaries=`` — avoiding one full upstream re-execution per
    chained call. Uses the same key materialization as _bucketed
    (including the decimal→BIGINT re-encode), so the returned tuples
    are directly comparable."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    work, specs, knames = _work_frame(df, keys)
    return _boundaries(work.select(*knames), specs, n)


def _prefix_offsets(parted: DataFrame, totals: list[tuple[Column, str, str]]) -> DataFrame:
    """One row per bucket id with, for every (total_agg, name, kind),
    the combined total of all EARLIER buckets (null when none) —
    computed wholly inside the plan: per-bucket aggregate → ONE row as
    a pid-sorted array → single array fold emitting running prefixes →
    explode back. n_buckets rows of metadata, broadcast-joined back."""
    tot = parted.groupBy(_PID).agg(
        *[agg.alias(name) for agg, name, _ in totals]
    )
    types = dict(tot.dtypes)
    entry = F.struct(
        F.col(_PID).alias("pid"), *[F.col(name).alias(name) for _, name, _ in totals]
    )
    one = tot.agg(F.sort_array(F.collect_list(entry)).alias("__arr"))
    zero = F.struct(
        F.expr(
            "CAST(array() AS array<struct<pid:int,"
            + ",".join(f"{n}:{types[n]}" for _, n, _ in totals)
            + ">>)"
        ).alias("out"),
        *[F.expr(f"CAST(NULL AS {types[name]})").alias(f"run_{name}") for _, name, _ in totals],
    )

    def step(acc, e):
        emitted = F.struct(
            e["pid"].alias("pid"),
            *[acc[f"run_{name}"].alias(name) for _, name, _ in totals],
        )
        return F.struct(
            F.concat(acc["out"], F.array(emitted)).alias("out"),
            *[
                _COMBINE[kind](acc[f"run_{name}"], e[name]).alias(f"run_{name}")
                for _, name, kind in totals
            ],
        )

    return one.select(
        F.explode(F.aggregate(F.col("__arr"), zero, step)["out"]).alias("e")
    ).select(
        F.col("e.pid").alias(_PID),
        *[F.col(f"e.{name}").alias(f"__off_{name}") for _, name, _ in totals],
    )


def _with_offsets(parted: DataFrame, totals: list[tuple[Column, str, str]]) -> DataFrame:
    return parted.join(F.broadcast(_prefix_offsets(parted, totals)), _PID, "left")


def global_row_number(
    df: DataFrame, keys: list, rn_col: str = "rn", num_partitions: int | None = None,
    boundaries: list | None = None,
) -> DataFrame:
    """Scalable ``row_number() over (order by *keys)`` (1-based).

    Identical to the single-task window whenever ``keys`` is a total
    order (callers append a tiebreaker otherwise)."""
    parted, specs, knames = _bucketed(df, keys, num_partitions, boundaries)
    w = Window.partitionBy(_PID).orderBy(*_sort_cols(specs))
    out = _with_offsets(parted, [(F.count(F.lit(1)), "cnt", "sum")])
    return (
        out.withColumn(
            rn_col,
            (F.row_number().over(w) + F.coalesce(F.col("__off_cnt"), F.lit(0))).cast("long"),
        )
        .drop(_PID, "__off_cnt", *knames)
    )


def rekey_row_id(df: DataFrame, keys: list, rid_col: str) -> DataFrame:
    """Re-derive the veneer's order column from a new sort: drop the old
    ``rid_col`` and replace it with the global row number over ``keys``
    (which may reference the old rid as tiebreaker)."""
    out = global_row_number(df, keys, "__new_rid")
    return out.drop(rid_col).withColumnRenamed("__new_rid", rid_col)


def prefix_scan(
    df: DataFrame,
    keys: list,
    value: Column,
    kind: str,
    out_col: str,
    mask: Column | None = None,
    num_partitions: int | None = None,
    boundaries: list | None = None,
) -> DataFrame:
    """Distributed cumulative aggregate (``kind`` ∈ sum/min/max/prod)
    of ``value`` over the global order by ``keys`` — the two-level
    prefix scan: per-bucket window scan ⊕ prefix-combined earlier-
    bucket totals. Aggregates skip nulls; ``mask`` nulls the OUTPUT at
    rows where the input is missing (pandas/cuDF scan semantics)."""
    combine = _COMBINE[kind]
    parted, specs, knames = _bucketed(df, keys, num_partitions, boundaries)
    w = (
        Window.partitionBy(_PID)
        .orderBy(*_sort_cols(specs))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    if kind == "prod":
        # Spark has no product window/agg: exact array fold; null when
        # no inputs yet (agg semantics). The emptiness guard is a cheap
        # running count — NOT a second O(frame) collect_list evaluation
        local = F.aggregate(
            F.collect_list(value).over(w), F.lit(1.0).cast("double"), lambda a, x: a * x
        )
        local = F.when(F.count(value).over(w) > 0, local)
        total = F.when(
            F.count(value) > 0,
            F.aggregate(F.collect_list(value), F.lit(1.0).cast("double"), lambda a, x: a * x),
        )
    else:
        agg = {"sum": F.sum, "min": F.min, "max": F.max}[kind]
        local = agg(value).over(w)
        total = agg(value)
    out = _with_offsets(parted, [(total, "t", kind)])
    # no isNotNull guard on `local`: _COMBINE already coalesces a null
    # local against the earlier-bucket offset, and guarding would emit
    # a spurious null whenever a null-INPUT row opens a non-first
    # bucket — output would then depend on boundary placement, breaking
    # the "boundaries affect only load balance" invariant
    expr = combine(local, F.col("__off_t"))
    if mask is not None:
        expr = F.when(mask, expr)
    return out.withColumn(out_col, expr).drop(_PID, "__off_t", *knames)


def global_shift(
    df: DataFrame, keys: list, cols: dict[str, str], periods: int,
    num_partitions: int | None = None, boundaries: list | None = None,
) -> DataFrame:
    """Shift columns by ``periods`` over the global order by ``keys``:
    number the rows, then equi-join row n with row n−periods — a keyed
    shuffle, never a single-task window. ``cols`` maps output name →
    source column."""
    numbered = global_row_number(df, keys, "__grn", num_partitions, boundaries)
    shifted = numbered.select(
        (F.col("__grn") + F.lit(int(periods))).alias("__grn"),
        *[F.col(c).alias(o) for o, c in cols.items()],
    )
    return numbered.join(shifted, "__grn", "left").drop("__grn")


def global_rank(
    df: DataFrame,
    value: Column,
    order,
    method: str,
    out_col: str,
    tiebreak: list | None = None,
    num_partitions: int | None = None,
    boundaries: list | None = None,
) -> DataFrame:
    """Distributed ``rank/dense/first/average`` over one global value
    order. Value-defined buckets co-locate equal keys, so per-bucket
    ranks are exact after adding the earlier-bucket offset: cumulative
    row count for rank/first/average, cumulative distinct-value count
    for dense (distinct sets are disjoint across buckets). ``order`` is
    the key spec (expr, 'asc'|'desc', 'nulls_first'|'nulls_last');
    ``tiebreak`` applies only to 'first' (row_number wants a total
    order — for the peer-grouped methods it would split ties)."""
    parted, specs, knames = _bucketed(df, [order], num_partitions, boundaries)
    sort_col = _sort_cols(specs)[0]
    w = Window.partitionBy(_PID).orderBy(sort_col)
    w_first = Window.partitionBy(_PID).orderBy(sort_col, *(tiebreak or []))
    out = _with_offsets(
        parted,
        [
            (F.count(F.lit(1)), "cnt", "sum"),
            # countDistinct skips nulls; a bucket holding nulls
            # contributes one extra dense value
            (F.countDistinct(value) + F.max(value.isNull().cast("long")), "nd", "sum"),
        ],
    )
    r_off = F.coalesce(F.col("__off_cnt"), F.lit(0))
    d_off = F.coalesce(F.col("__off_nd"), F.lit(0))
    if method == "dense":
        expr = F.dense_rank().over(w) + d_off
    elif method == "first":
        expr = F.row_number().over(w_first) + r_off
    elif method == "average":
        peers = F.count(F.lit(1)).over(
            w.rangeBetween(Window.currentRow, Window.currentRow)
        )
        expr = (2 * (F.rank().over(w) + r_off) + peers - 1) / 2.0
    else:  # "min"
        expr = F.rank().over(w) + r_off
    return out.withColumn(out_col, expr).drop(_PID, "__off_cnt", "__off_nd", *knames)


def blocked_rolling(
    df: DataFrame,
    keys: list,
    aggs: list,
    window_n: int,
    block: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Trailing ``window_n``-row rolling aggregates over the global order
    by ``keys``, without a global window: number the rows, bucket them
    into blocks of ``block`` rows, and DUPLICATE each block's last
    ``window_n−1`` rows into the next block as carry-in (they feed
    frames there but emit no output). Each block then evaluates its
    rolling frames inside a block-partitioned window — exact for any
    ``window_n ≤ block``, fully parallel, ~(w/B) row duplication.

    ``aggs``: list of (fn(window) → Column, output name)."""
    B = block or max(int(window_n) * 64, 1 << 16)
    assert window_n <= B, "window wider than block"
    numbered = global_row_number(df, keys, "__grn", num_partitions)
    blk = ((F.col("__grn") - 1) / B).cast("long")
    base = numbered.withColumn("__blk", blk).withColumn("__carry", F.lit(False))
    out_cols = base.columns
    if window_n > 1:
        carry = (
            numbered.filter(((F.col("__grn") - 1) % B) >= B - (window_n - 1))
            .withColumn("__blk", blk + 1)
            .withColumn("__carry", F.lit(True))
        )
        base = base.unionByName(carry)
    w = (
        Window.partitionBy("__blk")
        .orderBy("__grn")
        .rowsBetween(-(window_n - 1), 0)
    )
    proj = base
    for expr_fn, name in aggs:
        proj = proj.withColumn(name, expr_fn(w))
    return (
        proj.filter(~F.col("__carry"))
        .select(*[c for c in out_cols if c not in ("__blk", "__carry", "__grn")],
                *[name for _, name in aggs])
    )


def is_monotonic_dist(
    df: DataFrame, rid: str, col: Column, increasing: bool,
    num_partitions: int | None = None,
) -> bool:
    """Distributed monotonicity check over the ``rid`` order: in-bucket
    lag compare (parallel), reduced to ONE row per bucket (violations,
    first value, last value) in a single action; the bucket chain is
    verified driver-side over that bounded metadata. Null semantics
    match the single-task spelling it replaces: a null current value
    never counts as a violation."""
    slim = df.select(F.col(rid).alias("__r"), col.alias("__v"))
    parted, specs, knames = _bucketed(slim, ["__r"], num_partitions)
    w = Window.partitionBy(_PID).orderBy("__r")
    prev = F.lag("__v").over(w)
    cur = F.col("__v")
    ok = (cur >= prev) if increasing else (cur <= prev)
    stats = sorted(
        (r[_PID], r["bad"], r["first"], r["last"])
        for r in parted.select(
            _PID, "__r", "__v", F.when(prev.isNotNull() & ~ok, 1).alias("__b")
        )
        .groupBy(_PID)
        .agg(
            F.sum("__b").alias("bad"),
            F.min_by("__v", F.col("__r")).alias("first"),
            F.max_by("__v", F.col("__r")).alias("last"),
        )
        .collect()
    )
    if any(bad for _, bad, _, _ in stats):
        return False

    def _k(v):
        # mirror Spark's double total order in the driver-side chain
        # compare: NaN sorts GREATER than every double (Python's
        # `nan >= x` is False, which would flag a false violation)
        return float("inf") if _is_nan(v) else v

    for (_, _, _, last_a), (_, _, first_b, _) in zip(stats, stats[1:]):
        if last_a is None or first_b is None:
            continue
        if increasing and not (_k(first_b) >= _k(last_a)):
            return False
        if not increasing and not (_k(first_b) <= _k(last_a)):
            return False
    return True
