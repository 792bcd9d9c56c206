"""Lakehouse (deltalite) queries: atomic commits, time travel, skipping.

Each query builds a deltalite table in a pid-keyed temp dir (same
discipline as io_ml.py), drives the TRANSACTION protocol — multi-commit
appends, an overwrite, a compaction — and reads a snapshot back through
``read_table``. The oracle reads the ORIGINAL parquet and re-expresses
the snapshot algebraically (a version is just a filter over the source
rows that were appended up to it), so every hash-compare checks that
log replay + atomic visibility reconstruct EXACTLY the right row set.

100 TB posture: data moves only through Spark's distributed parquet
writer/reader; the transaction log is O(files) driver-side metadata —
the same cost profile as Delta's commit protocol.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from pygdf_spark.queries._util import T, cents, sql_cents


def _tmp(sf_dir: str, tag: str) -> str:
    sf = os.path.basename(sf_dir.rstrip("/")) or "sf"
    return os.path.join(tempfile.gettempdir(), f"pygdf_{tag}_{sf}_{os.getpid()}")


def _shards(df, rows_per_shard: int = 50_000) -> int:
    """Fixed-size shards, data-scaled count (io_ml._shards discipline)."""
    return max(2, -(-df.count() // rows_per_shard))


def _src_rows(sf_dir: str, name: str) -> int:
    """Row count of a source table from its parquet FOOTER metadata —
    no Spark job (opt r7, guide §1.2: every lake query used to pay one
    full-scan ``count()`` action just to size its write fan-out when
    the metadata already knows the answer). Only valid for an
    UNFILTERED source frame (projections keep the row count — every
    call site below qualifies)."""
    import pyarrow.parquet as pq

    p = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isdir(p):
        return sum(
            pq.ParquetFile(os.path.join(p, f)).metadata.num_rows
            for f in os.listdir(p) if f.endswith(".parquet")
        )
    return pq.ParquetFile(p).metadata.num_rows


def _shards_src(sf_dir: str, name: str, rows_per_shard: int = 50_000) -> int:
    """``_shards`` from footer metadata — same value, no count() job."""
    return max(2, -(-_src_rows(sf_dir, name) // rows_per_shard))


def lake_snapshot_read(spark, sf_dir):
    """Three disjoint appends (o_orderkey mod 3) with a COMPACT between
    the second and third — read the LATEST snapshot and aggregate.
    Compaction is a pure metadata swap, and the three appends are
    atomic, so the snapshot must equal the full source table."""
    from pygdf_spark.sources import deltalite as dl

    base = T(spark, sf_dir, "orders")
    path = _tmp(sf_dir, "lake_orders")
    shutil.rmtree(path, ignore_errors=True)
    n = _shards_src(sf_dir, "orders")
    for r in (0, 1):
        dl.append(base.filter(F.col("o_orderkey") % 3 == r).repartition(n), path)
    dl.compact(spark, path, num_files=max(1, n // 2))
    dl.append(base.filter(F.col("o_orderkey") % 3 == 2).repartition(n), path)
    snap = dl.read_table(spark, path)
    return (
        snap.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(cents("o_totalprice")).alias("total_cents"),
        )
        .orderBy("o_orderstatus")
    )


LAKE_SNAPSHOT_SQL = f"""
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM({sql_cents('o_totalprice')}) AS BIGINT) AS total_cents
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def lake_time_travel(spark, sf_dir):
    """Append even events (v0), append odd events (v1), then OVERWRITE
    with only 'view' events (v2). Read versions 1 and 2 side by side:
    time travel must reconstruct the pre-overwrite table exactly while
    the latest snapshot sees only the overwrite's rows."""
    from pygdf_spark.sources import deltalite as dl

    base = T(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    path = _tmp(sf_dir, "lake_events")
    shutil.rmtree(path, ignore_errors=True)
    n = _shards_src(sf_dir, "events")
    dl.append(base.filter(F.col("event_id") % 2 == 0).repartition(n), path)
    dl.append(base.filter(F.col("event_id") % 2 == 1).repartition(n), path)
    dl.overwrite(base.filter(F.col("event_type") == "view").repartition(n), path)

    def agg(df, tag):
        return df.agg(
            F.lit(tag).alias("snapshot"),
            F.count("*").alias("n_events"),
            F.sum("event_id").alias("id_sum"),
            F.sum(cents("value")).alias("value_cents"),
        )

    v1 = agg(dl.read_table(spark, path, version=1), "v1_pre_overwrite")
    v2 = agg(dl.read_table(spark, path, version=2), "v2_latest")
    return v1.unionAll(v2).orderBy("snapshot")


LAKE_TIME_TRAVEL_SQL = f"""
SELECT * FROM (
  SELECT 'v1_pre_overwrite' AS snapshot, COUNT(*) AS n_events,
         CAST(SUM(event_id) AS BIGINT) AS id_sum,
         CAST(SUM({sql_cents('value')}) AS BIGINT) AS value_cents
  FROM events
  UNION ALL
  SELECT 'v2_latest', COUNT(*), CAST(SUM(event_id) AS BIGINT),
         CAST(SUM({sql_cents('value')}) AS BIGINT)
  FROM events WHERE event_type = 'view'
) ORDER BY snapshot
"""


def lake_file_skipping(spark, sf_dir):
    """Range-clustered write (one commit, ``cluster_by`` so per-file
    min/max zone maps are tight and non-overlapping) → predicate read.
    ``read_table`` prunes files whose footer stats prove exclusion
    BEFORE Spark plans the scan and still applies the predicate as a
    real filter — so this hash-checks that skipping never drops a
    matching row. The skip-count itself is asserted in
    tests/test_deltalite.py (stats pruning must actually bite)."""
    from pygdf_spark.sources import deltalite as dl

    base = T(spark, sf_dir, "lineitem")
    path = _tmp(sf_dir, "lake_lineitem")
    shutil.rmtree(path, ignore_errors=True)
    dl.append(
        base,
        path,
        stat_cols=["l_orderkey"],
        cluster_by=["l_orderkey"],
        target_files=max(4, _shards_src(sf_dir, "lineitem")),
    )
    # bounded driver literal: one 1-row aggregate (the oracle mirrors it
    # as a scalar subquery) — the predicate cut is data-derived, not a
    # fixture constant, so it holds at every SF
    # integer div on BOTH sides (Spark cast-of-double truncates while
    # DuckDB CAST rounds — 'div' / '//' agree exactly)
    bound = base.agg(F.expr("max(l_orderkey) div 2")).first()[0]
    snap = dl.read_table(
        spark, path, predicate=[("l_orderkey", "<=", int(bound))]
    )
    return snap.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.sum(cents("l_extendedprice")).alias("price_cents"),
        F.sum("l_orderkey").alias("key_sum"),
    ).orderBy("l_returnflag")


LAKE_SKIPPING_SQL = f"""
SELECT l_returnflag, COUNT(*) AS n_rows,
       CAST(SUM({sql_cents('l_extendedprice')}) AS BIGINT) AS price_cents,
       CAST(SUM(l_orderkey) AS BIGINT) AS key_sum
FROM lineitem
WHERE l_orderkey <= (SELECT MAX(l_orderkey) FROM lineitem) // 2
GROUP BY l_returnflag ORDER BY l_returnflag
"""


def lake_merge_upsert(spark, sf_dir):
    """MERGE INTO (CDC upsert): build a range-clustered orders table,
    then merge a source of (a) UPDATES — a contiguous low-key band gets
    its price doubled — and (b) INSERTS — brand-new keys past the max.
    The two-pass merge (stats prune → input_file_name touch join)
    rewrites only the files holding matched keys; the oracle
    reconstructs the post-merge table algebraically, so the hash checks
    update-wins semantics, insert placement, and that untouched rows
    rode through the commit byte-identical."""
    from pygdf_spark.sources import deltalite as dl

    base = T(spark, sf_dir, "orders")
    path = _tmp(sf_dir, "lake_merge")
    shutil.rmtree(path, ignore_errors=True)
    dl.append(
        base, path,
        stat_cols=["o_orderkey"], cluster_by=["o_orderkey"],
        target_files=max(4, _shards_src(sf_dir, "orders")),
    )
    mx = base.agg(F.max("o_orderkey")).first()[0]  # bounded 1-row agg
    band = int(mx) // 5
    updates = base.filter(F.col("o_orderkey") <= band).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    inserts = (
        base.filter(F.col("o_orderkey") % 50 == 0)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(int(mx) + 1))
        .withColumn("o_totalprice", F.col("o_totalprice") + 1000)
    )
    dl.merge_into(
        spark, path, updates.unionByName(inserts), on="o_orderkey",
        stat_cols=["o_orderkey"],
    )
    snap = dl.read_table(spark, path)
    return snap.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum(cents("o_totalprice")).alias("price_cents"),
        F.sum("o_orderkey").alias("key_sum"),
    ).orderBy("o_orderstatus")


LAKE_MERGE_SQL = f"""
WITH mx AS (SELECT MAX(o_orderkey) AS m FROM orders),
fin AS (
  SELECT o_orderstatus, o_orderkey,
         CASE WHEN o_orderkey <= (SELECT m FROM mx) // 5
              THEN o_totalprice * 2 ELSE o_totalprice END AS p
  FROM orders
  UNION ALL
  SELECT o_orderstatus, o_orderkey + (SELECT m FROM mx) + 1,
         o_totalprice + 1000
  FROM orders WHERE o_orderkey % 50 = 0
)
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM({sql_cents('p')}) AS BIGINT) AS price_cents,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
FROM fin GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def lake_zorder_skip(spark, sf_dir):
    """Z-ORDER clustering (OPTIMIZE ZORDER analog): one append writes
    orders Morton-interleaved on (o_custkey, o_orderkey), then TWO
    predicate reads — one per dimension — each pruned by the same
    per-file footer stats. Z-ordering is the only layout where BOTH
    single-column predicates skip files (a 1-D sort makes the other
    column's per-file ranges full-width); the per-dimension skip counts
    are asserted in tests/test_deltalite.py. The oracle reconstructs
    both filtered aggregates from the source, so the hash checks that
    multi-dimensional clustering never loses a row."""
    from pygdf_spark.sources import deltalite as dl

    base = T(spark, sf_dir, "orders")
    path = _tmp(sf_dir, "lake_zorder")
    shutil.rmtree(path, ignore_errors=True)
    dl.append_zorder(
        base, path,
        ["o_custkey", "o_orderkey"],
        num_files=max(4, _shards_src(sf_dir, "orders")),
    )
    outs = []
    for dim in ("o_custkey", "o_orderkey"):
        bound = base.agg(F.expr(f"max({dim}) div 4")).first()[0]
        snap = dl.read_table(spark, path, predicate=[(dim, "<=", int(bound))])
        outs.append(
            snap.agg(
                F.lit(dim).alias("dim"),
                F.count("*").alias("n_orders"),
                F.sum("o_orderkey").alias("key_sum"),
                F.sum(cents("o_totalprice")).alias("price_cents"),
            )
        )
    return outs[0].unionAll(outs[1]).orderBy("dim")


LAKE_ZORDER_SQL = f"""
SELECT * FROM (
  SELECT 'o_custkey' AS dim, COUNT(*) AS n_orders,
         CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
         CAST(SUM({sql_cents('o_totalprice')}) AS BIGINT) AS price_cents
  FROM orders
  WHERE o_custkey <= (SELECT MAX(o_custkey) FROM orders) // 4
  UNION ALL
  SELECT 'o_orderkey', COUNT(*), CAST(SUM(o_orderkey) AS BIGINT),
         CAST(SUM({sql_cents('o_totalprice')}) AS BIGINT)
  FROM orders
  WHERE o_orderkey <= (SELECT MAX(o_orderkey) FROM orders) // 4
) ORDER BY dim
"""


def lake_change_feed(spark, sf_dir):
    """Change Data Feed: append events (v0), MERGE a CDC batch (v1 —
    a value bump for every 7th key + brand-new keys past the max), then
    read the row-level changes (v0, v1] with key-based diffing. Rows
    that merely moved files during the merge rewrite must produce NO
    change rows — the oracle reconstructs exactly the insert /
    update_preimage / update_postimage sets, so a single phantom
    "change" from a rewritten-but-unchanged row breaks the hash."""
    from pygdf_spark.sources import deltalite as dl

    base = T(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    path = _tmp(sf_dir, "lake_cdf")
    shutil.rmtree(path, ignore_errors=True)
    dl.append(
        base, path,
        stat_cols=["event_id"], cluster_by=["event_id"],
        target_files=max(4, _shards_src(sf_dir, "events")),
    )
    mx = int(base.agg(F.max("event_id")).first()[0])
    updates = base.filter(F.col("event_id") % 7 == 0).withColumn(
        "value", F.col("value") + 1
    )
    inserts = (
        base.filter(F.col("event_id") % 100 == 0)
        .withColumn("event_id", F.col("event_id") + F.lit(mx + 1))
        .withColumn("value", F.col("value") + 5)
    )
    dl.merge_into(spark, path, updates.unionByName(inserts),
                  on="event_id", stat_cols=["event_id"])
    changes = dl.table_changes(spark, path, 0, 1, key="event_id")
    return (
        changes.groupBy(F.col("_change_type").alias("change_type"))
        .agg(
            F.count("*").alias("n"),
            F.sum("event_id").alias("id_sum"),
            F.sum(cents("value")).alias("value_cents"),
        )
        .orderBy("change_type")
    )


LAKE_CDF_SQL = f"""
WITH mx AS (SELECT MAX(event_id) AS m FROM events)
SELECT * FROM (
  SELECT 'insert' AS change_type, COUNT(*) AS n,
         CAST(SUM(event_id + (SELECT m FROM mx) + 1) AS BIGINT) AS id_sum,
         CAST(SUM({sql_cents('(value + 5)')}) AS BIGINT) AS value_cents
  FROM events WHERE event_id % 100 = 0
  UNION ALL
  SELECT 'update_preimage', COUNT(*), CAST(SUM(event_id) AS BIGINT),
         CAST(SUM({sql_cents('value')}) AS BIGINT)
  FROM events WHERE event_id % 7 = 0
  UNION ALL
  SELECT 'update_postimage', COUNT(*), CAST(SUM(event_id) AS BIGINT),
         CAST(SUM({sql_cents('(value + 1)')}) AS BIGINT)
  FROM events WHERE event_id % 7 = 0
) ORDER BY change_type
"""


def lake_incremental_matview(spark, sf_dir):
    """Incrementally-maintained materialized aggregate (continuous-
    aggregate shape): per-user COUNT/SUM view over an events lake
    table, created at v0, then refreshed by CONSUMING THE CHANGE FEED
    after an append (new events) and a CDC merge (value bumps) — the
    refresh applies signed per-group deltas via merge_into and records
    the consumed source version as a txn action (resumable and
    idempotent). The oracle recomputes the aggregate from scratch, so
    the hash proves incremental == full recompute exactly."""
    from pygdf_spark.operators.matview import (
        create_agg_view,
        read_agg_view,
        refresh_agg_view,
    )
    from pygdf_spark.sources import deltalite as dl

    base = T(spark, sf_dir, "events").select(
        "event_id", "user_id", cents("value").alias("value_cents")
    )
    root = _tmp(sf_dir, "lake_mv")
    shutil.rmtree(root, ignore_errors=True)
    src, view = os.path.join(root, "src"), os.path.join(root, "view")
    n = _shards_src(sf_dir, "events")
    dl.append(base, src, stat_cols=["event_id"],
              cluster_by=["event_id"], target_files=n)       # src v0
    create_agg_view(spark, src, view, "user_id", "value_cents")
    mx = int(base.agg(F.max("event_id")).first()[0])
    appended = base.withColumn(
        "event_id", F.col("event_id") + F.lit(mx + 1)
    ).withColumn("value_cents", F.col("value_cents") + 300)
    dl.append(appended, src, stat_cols=["event_id"],
              cluster_by=["event_id"], target_files=n)       # src v1
    updates = base.filter(F.col("event_id") % 11 == 0).withColumn(
        "value_cents", F.col("value_cents") + 200
    )
    dl.merge_into(spark, src, updates, on="event_id",
                  stat_cols=["event_id"])                    # src v2
    refresh_agg_view(spark, src, view, "user_id", "value_cents",
                     key="event_id")
    return read_agg_view(spark, view).orderBy("user_id")


LAKE_MATVIEW_SQL = f"""
WITH fin AS (
  SELECT user_id,
         CASE WHEN event_id % 11 = 0
              THEN {sql_cents('value')} + 200
              ELSE {sql_cents('value')} END AS vc
  FROM events
  UNION ALL
  SELECT user_id, {sql_cents('value')} + 300 FROM events
)
SELECT user_id, COUNT(*) AS n_rows, CAST(SUM(vc) AS BIGINT) AS sum_val
FROM fin GROUP BY user_id ORDER BY user_id
"""


def lake_delete_dv(spark, sf_dir):
    """Merge-on-read DELETE via deletion vectors: a range-clustered
    orders table takes TWO overlapping dv deletes (no data file is
    rewritten — each commit writes only an O(matches) position sidecar
    and re-publishes the touched add actions), then the snapshot is
    read back merge-on-read (scan + anti-join of the deleted
    positions). The oracle applies both predicates algebraically, so
    the hash proves the DV read path loses exactly the deleted rows —
    no resurrection, no over-delete — across consolidated overlapping
    vectors."""
    from pygdf_spark.sources import deltalite as dl

    base = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    path = _tmp(sf_dir, "lake_dv")
    shutil.rmtree(path, ignore_errors=True)
    dl.append(
        base, path,
        stat_cols=["o_orderkey"], cluster_by=["o_orderkey"],
        target_files=max(4, _shards_src(sf_dir, "orders")),
    )
    dl.delete_where(spark, path, [("o_orderstatus", "=", "F")])      # v1
    dl.delete_where(spark, path, "o_orderkey % 10 = 3")              # v2
    snap = dl.read_table(spark, path)
    return (
        snap.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
            F.sum(cents("o_totalprice")).alias("total_cents"),
        )
        .orderBy("o_orderstatus")
    )


LAKE_DELETE_DV_SQL = f"""
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM({sql_cents('o_totalprice')}) AS BIGINT) AS total_cents
FROM orders
WHERE o_orderstatus <> 'F' AND o_orderkey % 10 <> 3
GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def lake_restore(spark, sf_dir):
    """RESTORE TABLE TO VERSION AS OF: append (v0), dv-delete the 'O'
    orders (v1), destructive OVERWRITE down to only 'P' orders (v2),
    then RESTORE to v1 (v3) — a new versioned commit that re-pins v1's
    file set INCLUDING its deletion vector. The result reads v2 and v3
    side by side: the overwrite must still be visible at its own
    version while the restored head equals the pre-overwrite snapshot
    exactly (DV re-attached, not resurrected)."""
    from pygdf_spark.sources import deltalite as dl

    base = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = _tmp(sf_dir, "lake_restore")
    shutil.rmtree(path, ignore_errors=True)
    n = _shards_src(sf_dir, "orders")
    dl.append(base, path, stat_cols=["o_orderkey"],
              cluster_by=["o_orderkey"], target_files=n)             # v0
    dl.delete_where(spark, path, [("o_orderstatus", "=", "O")])      # v1
    dl.overwrite(
        base.filter(F.col("o_orderstatus") == "P").repartition(n), path
    )                                                                # v2
    dl.restore(path, 1)                                              # v3

    def agg(df, tag):
        return df.agg(
            F.lit(tag).alias("snapshot"),
            F.count("*").alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
            F.sum(cents("o_totalprice")).alias("total_cents"),
        )

    v2 = agg(dl.read_table(spark, path, version=2), "v2_overwrite")
    v3 = agg(dl.read_table(spark, path), "v3_restored")
    return v2.unionAll(v3).orderBy("snapshot")


LAKE_RESTORE_SQL = f"""
SELECT * FROM (
  SELECT 'v2_overwrite' AS snapshot, COUNT(*) AS n_orders,
         CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
         CAST(SUM({sql_cents('o_totalprice')}) AS BIGINT) AS total_cents
  FROM orders WHERE o_orderstatus = 'P'
  UNION ALL
  SELECT 'v3_restored', COUNT(*), CAST(SUM(o_orderkey) AS BIGINT),
         CAST(SUM({sql_cents('o_totalprice')}) AS BIGINT)
  FROM orders WHERE o_orderstatus <> 'O'
) ORDER BY snapshot
"""


def lake_bloom_skip(spark, sf_dir):
    """Per-file BLOOM INDEX point lookups: orders keyed by an
    UNCLUSTERED high-cardinality surrogate (md5 of the orderkey) are
    written across shards with ``bloom_cols`` — min/max zone maps are
    useless on random hex (every file's range overlaps every literal),
    but the bitset probe prunes non-holding files at PLAN time. Twelve
    deterministic point lookups run as individually-pruned snapshot
    reads and union; the oracle recomputes the same row set
    relationally, so a bloom false-NEGATIVE (dropped match) breaks the
    hash — false positives only cost scan."""
    import hashlib

    from pygdf_spark.sources import deltalite as dl

    base = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice",
        F.md5(F.col("o_orderkey").cast("string")).alias("uk"),
    )
    path = _tmp(sf_dir, "lake_bloom")
    shutil.rmtree(path, ignore_errors=True)
    dl.append(base.repartition(max(8, _shards_src(sf_dir, "orders"))), path,
              bloom_cols=["uk"])
    keys = [
        r[0] for r in base.filter(F.col("o_orderkey") % 83 == 0)
        .orderBy("o_orderkey").limit(12).select("o_orderkey").collect()
    ]
    parts = [
        dl.read_table(
            spark, path,
            predicate=[("uk", "=", hashlib.md5(str(k).encode()).hexdigest())],
        )
        for k in keys
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.sum("o_orderkey").alias("key_sum"),
        F.sum(cents("o_totalprice")).alias("price_cents"),
    )


LAKE_BLOOM_SQL = f"""
WITH k AS (
  SELECT o_orderkey FROM orders WHERE o_orderkey % 83 = 0
  ORDER BY o_orderkey LIMIT 12
)
SELECT COUNT(*) AS n_hits,
       CAST(SUM(o.o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM({sql_cents('o.o_totalprice')}) AS BIGINT) AS price_cents
FROM orders o JOIN k ON o.o_orderkey = k.o_orderkey
"""


def lake_replace_where(spark, sf_dir):
    """Dynamic predicate overwrite (Delta replaceWhere;
    sources/deltalite.py overwrite_where): land orders clustered by
    o_orderdate, then atomically RE-LAND the 1995 slice with amended
    totals (+7 cents) — the daily/period backfill primitive. Files
    wholly inside 1995 drop as pure metadata (clustered zone maps make
    that the common case), boundary files rewrite without their 1995
    rows, the amended slice lands in the SAME commit. The oracle
    recomputes the post-backfill table algebraically, so the hash pins
    atomicity + scope (nothing outside 1995 may move). A files_removed
    assertion pins that whole-file drops actually happened — the scale
    behavior under test, not just the row set."""
    from pygdf_spark.sources import deltalite as dl

    base = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", cents("o_totalprice").alias("cents")
    )
    path = _tmp(sf_dir, "lake_rw")
    shutil.rmtree(path, ignore_errors=True)
    # >= 16 date-clustered files: the 12-month replace window then always
    # fully contains at least one file (orders span ~7 years), so the
    # whole-file metadata drop is exercised at every scale factor
    n = min(256, max(16, _src_rows(sf_dir, "orders") // 10_000))
    dl.append(
        base, path,
        stat_cols=["o_orderdate"], cluster_by=["o_orderdate"],
        target_files=n,
    )
    lo, hi = "1995-01-01", "1996-01-01"
    amended = base.filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    ).withColumn("cents", F.col("cents") + F.lit(7))
    res = dl.overwrite_where(
        spark, amended, path,
        [("o_orderdate", ">=", lo), ("o_orderdate", "<", hi)],
        stat_cols=["o_orderdate"],
    )
    assert res["files_removed"] > 0, "clustered backfill must drop whole files"
    snap = dl.read_table(spark, path)
    return (
        snap.groupBy(F.year("o_orderdate").alias("yr"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("cents").alias("total_cents"),
        )
        .orderBy("yr")
    )


LAKE_REPLACE_WHERE_SQL = f"""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
       COUNT(*) AS n_orders,
       CAST(SUM({sql_cents('o_totalprice')}
                + CASE WHEN o_orderdate >= DATE '1995-01-01'
                        AND o_orderdate <  DATE '1996-01-01'
                       THEN 7 ELSE 0 END) AS BIGINT) AS total_cents
FROM orders GROUP BY 1 ORDER BY yr
"""


def lake_partition_prune(spark, sf_dir):
    """Hive-partitioned deltalite table (partition_by year(o_orderdate);
    sources/deltalite.py append/partition_by): every data file is
    single-valued on the partition column with its value in the log, so
    (a) DELETE of one partition commits as PURE METADATA — zero rows
    scanned or moved (asserted: the commit adds no files), and (b) a
    partition predicate prunes the scan from the log alone (asserted
    via plan_files). The oracle recomputes the post-delete table
    algebraically — the hash pins that metadata-only DML produced
    exactly the right row set. This is the 100 TB primitive: dropping a
    day/region of a petabyte table costs one log write."""
    from pygdf_spark.sources import deltalite as dl

    base = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate",
        F.year("o_orderdate").cast("int").alias("yr"),
        cents("o_totalprice").alias("cents"),
    )
    path = _tmp(sf_dir, "lake_part")
    shutil.rmtree(path, ignore_errors=True)
    dl.append(base, path, partition_by=["yr"])
    before = {a["path"] for a in dl.live_files(path)}
    res = dl.delete_where(spark, path, [("yr", "=", 1995)])
    after = {a["path"] for a in dl.live_files(path)}
    assert res["rows_deleted"] > 0 and after < before, \
        "partition delete must be a pure-metadata file drop"
    sel, total = dl.plan_files(path, predicate=[("yr", "=", 1997)])
    assert len(sel) < total, "partition predicate must prune files"
    snap = dl.read_table(spark, path)
    return (
        snap.groupBy("yr")
        .agg(F.count("*").alias("n_orders"),
             F.sum("cents").alias("total_cents"))
        .orderBy("yr")
    )


LAKE_PARTITION_PRUNE_SQL = f"""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
       COUNT(*) AS n_orders,
       CAST(SUM({sql_cents('o_totalprice')}) AS BIGINT) AS total_cents
FROM orders
WHERE EXTRACT(year FROM o_orderdate) <> 1995
GROUP BY 1 ORDER BY yr
"""


def lake_update_where(spark, sf_dir):
    """Copy-on-write UPDATE (sources/deltalite.py update_where): land
    orders clustered by o_orderkey, then UPDATE SET cents = cents + 50,
    status = lower(status) WHERE o_orderkey < K. Stats pruning + touch
    detection rewrite ONLY the files holding matching keys (asserted:
    files_rewritten < files_total), SET expressions evaluate against
    the pre-update row, and non-matching rows ride through bit-intact.
    The oracle is the algebraic CASE WHEN over the source."""
    from pygdf_spark.sources import deltalite as dl

    base = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus",
        cents("o_totalprice").alias("cents"),
    )
    path = _tmp(sf_dir, "lake_upd")
    shutil.rmtree(path, ignore_errors=True)
    n = min(256, max(16, _src_rows(sf_dir, "orders") // 10_000))
    dl.append(base, path, stat_cols=["o_orderkey"],
              cluster_by=["o_orderkey"], target_files=n)
    # fixed threshold: TPC-H orderkeys are a fixed low-end pattern, so
    # keys < 600 exist at EVERY scale factor while staying a small
    # fraction of the clustered key range (files_rewritten stays < total)
    k = 600
    res = dl.update_where(
        spark, path, [("o_orderkey", "<", k)],
        {"cents": "cents + 50", "o_orderstatus": "lower(o_orderstatus)"},
        stat_cols=["o_orderkey"],
    )
    assert res["rows_updated"] > 0
    assert res["files_rewritten"] < res["files_total"], \
        "touch detection must leave untouched files as pure metadata"
    snap = dl.read_table(spark, path)
    return (
        snap.groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_orders"),
             F.sum("cents").alias("total_cents"))
        .orderBy("o_orderstatus")
    )


LAKE_UPDATE_WHERE_SQL = f"""
WITH upd AS (
  SELECT CASE WHEN o_orderkey < 600
              THEN lower(o_orderstatus) ELSE o_orderstatus
         END AS o_orderstatus,
         {sql_cents('o_totalprice')}
         + CASE WHEN o_orderkey < 600 THEN 50 ELSE 0 END
         AS cents
  FROM orders
)
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS total_cents
FROM upd GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def lake_incremental_lsh(spark, sf_dir):
    """Incrementally-maintained near-dup INDEX over a lakehouse corpus —
    the composite a 100 TB curation stack actually runs: the MinHash
    signature table is refreshed from the docs table's CHANGE FEED
    instead of recomputed (signatures for inserted docs merged in,
    tombstoned doc_ids merge-DELETED), so refresh cost is O(changes),
    not O(corpus).

    Protocol under test: v0 initial corpus → full index build → v1
    append (new docs) → v2 predicate takedown (DV delete) → one CDC
    apply: net the feed per key (last change wins — a doc inserted in
    v1 and deleted in v2 must NOT survive), merge-delete the tombstones,
    merge-upsert the insert signatures. The oracle recomputes signatures
    from the FINAL doc set, so the hash pins that incremental
    maintenance converges to the from-scratch index exactly."""
    from pyspark.sql import Window

    from pygdf_spark.operators.dedup import minhash_signatures
    from pygdf_spark.sources import deltalite as dl

    docs = T(spark, sf_dir, "documents").select("doc_id", "text")
    tbl = _tmp(sf_dir, "lake_lsh_docs")
    idx = _tmp(sf_dir, "lake_lsh_idx")
    for p in (tbl, idx):
        shutil.rmtree(p, ignore_errors=True)

    def sigs(frame):
        return minhash_signatures(frame).filter(F.col("minhash").isNotNull())

    # v0 + full build
    dl.append(docs.filter(F.col("doc_id") % 3 != 2).repartition(4), tbl,
              stat_cols=["doc_id"])
    dl.append(sigs(dl.read_table(spark, tbl)), idx, stat_cols=["doc_id"])
    cursor = dl.table_version(tbl)
    # the corpus moves: new docs, then a takedown
    dl.append(docs.filter(F.col("doc_id") % 3 == 2).repartition(4), tbl,
              stat_cols=["doc_id"])
    dl.delete_where(spark, tbl, "doc_id % 5 = 0", mode="dv")
    # one CDC apply: net per key (last change wins)
    head = dl.table_version(tbl)
    ch = dl.table_changes(spark, tbl, cursor, head, key="doc_id")
    rank = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(
            F.desc("_commit_version"),
            # within one commit a pre/post pair nets to the postimage
            F.desc(F.col("_change_type").isin("insert", "update_postimage")),
        )
    )
    net = ch.withColumn("__r", rank).filter(F.col("__r") == 1).drop("__r")
    tombstones = net.filter(F.col("_change_type") == "delete").select("doc_id")
    upserts = net.filter(
        F.col("_change_type").isin("insert", "update_postimage")
    ).select("doc_id", "text")
    dl.merge_into(spark, idx, tombstones, on="doc_id",
                  when_matched="delete", stat_cols=["doc_id"])
    dl.merge_into(spark, idx, sigs(upserts), on="doc_id",
                  stat_cols=["doc_id"])
    # compact per-perm summary of the final index — pins every row
    return (
        dl.read_table(spark, idx)
        .groupBy("perm")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("minhash").alias("mh_sum"),
            F.min("minhash").alias("mh_min"),
            F.max("minhash").alias("mh_max"),
        )
        .orderBy("perm")
    )


def _lake_lsh_sql() -> str:
    from pygdf_spark.functions.hashing import MERSENNE_P, minhash_perm_sql

    p = MERSENNE_P
    perm_rows = " UNION ALL ".join(
        f"SELECT doc_id, {i} AS perm, {minhash_perm_sql('x', i)} AS h"
        " FROM hashed"
        for i in range(6)
    )
    return rf"""
WITH shingles AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           UNNEST(list_transform(generate_series(1, greatest(len(w)-2, 0)),
                                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
    FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
          FROM documents WHERE doc_id % 5 <> 0)
  )
),
hashed AS (
  SELECT doc_id, CAST(md5_number_lower(shingle) % {p} AS BIGINT) AS x
  FROM shingles
),
sigs AS (
  SELECT doc_id, perm, MIN(h) AS minhash FROM ({perm_rows})
  GROUP BY doc_id, perm
)
SELECT perm, COUNT(*) AS n_docs, CAST(SUM(minhash) AS BIGINT) AS mh_sum,
       CAST(MIN(minhash) AS BIGINT) AS mh_min,
       CAST(MAX(minhash) AS BIGINT) AS mh_max
FROM sigs GROUP BY perm ORDER BY perm
"""


def lake_partition_evolution(spark, sf_dir):
    """Iceberg-style PARTITION EVOLUTION (sources/deltalite.py
    set_partition_spec): land 1992-94 orders unpartitioned, evolve the
    spec to partition by order year (a pure metadata commit), land
    1995-98 hive-partitioned, then run DML across the mixed-era layout:
    (a) DELETE yr=1996 touches only current-era files — pure metadata
    (asserted: zero files added); (b) DELETE yr=1993 is HYBRID — the
    log can't decide pre-spec files, so they take the deletion-vector
    scan while current-era files classify log-only (asserted: a DV
    appears on a pre-spec file); (c) OPTIMIZE migrates the survivors
    into the current spec (asserted: every live file carries partition
    values afterwards). The oracle recomputes the end state
    algebraically — the hash pins that every era/path combination
    deleted exactly the right rows."""
    from pygdf_spark.sources import deltalite as dl

    base = T(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("yr"),
        cents("o_totalprice").alias("cents"),
    )
    path = _tmp(sf_dir, "lake_pevo")
    shutil.rmtree(path, ignore_errors=True)
    dl.append(base.filter(F.col("yr") <= 1997), path)   # era 0: no spec
    dl.set_partition_spec(path, ["yr"])
    dl.append(base.filter(F.col("yr") >= 1998), path)   # era 1: hive
    files_before = {a["path"] for a in dl.live_files(path)}
    res_meta = dl.delete_where(spark, path, [("yr", "=", 1999)])
    files_after = {a["path"] for a in dl.live_files(path)}
    assert res_meta["rows_deleted"] > 0 and files_after < files_before, \
        "current-era partition delete must stay pure metadata"
    res_hybrid = dl.delete_where(spark, path, [("yr", "=", 1996)],
                                 mode="dv")
    assert res_hybrid["rows_deleted"] > 0
    assert any(
        a.get("dv") and "__p_yr=" not in a["path"]
        for a in dl.live_files(path)
    ), "pre-spec files must take the DV scan path"
    dl.compact(spark, path)
    assert all(
        (a.get("partition") or {}).get("yr") is not None
        for a in dl.live_files(path)
    ), "OPTIMIZE must migrate pre-spec files into the current spec"
    snap = dl.read_table(spark, path)
    return (
        snap.groupBy("yr")
        .agg(F.count("*").alias("n_orders"),
             F.sum("cents").alias("total_cents"))
        .orderBy("yr")
    )


LAKE_PARTITION_EVOLUTION_SQL = f"""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
       COUNT(*) AS n_orders,
       CAST(SUM({sql_cents('o_totalprice')}) AS BIGINT) AS total_cents
FROM orders
WHERE EXTRACT(year FROM o_orderdate) NOT IN (1996, 1999)
GROUP BY 1 ORDER BY yr
"""


def lake_sql_surface(spark, sf_dir):
    """The Delta-style SQL statement surface
    (sources/lakehouse_sql.py): the same lifecycle a Delta user types —
    DELETE / UPDATE / INSERT INTO / OPTIMIZE / SELECT ... VERSION AS OF
    — driven entirely through SQL strings and dispatched onto the
    transaction protocol. The WHERE clauses compile to stats-prunable
    predicate tuples (same file skipping as the Python API). The oracle
    recomputes the end state algebraically, so the hash pins that every
    statement's parse + dispatch did exactly what the SQL says."""
    from pygdf_spark.sources import deltalite as dl
    from pygdf_spark.sources.lakehouse_sql import sql

    base = T(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("yr"),
        cents("o_totalprice").alias("cents"),
    )
    path = _tmp(sf_dir, "lake_sql")
    shutil.rmtree(path, ignore_errors=True)
    dl.append(base, path, stat_cols=["o_orderkey"],
              cluster_by=["o_orderkey"])
    cat = {"orders_lake": path}
    r = sql(spark, "DELETE FROM orders_lake WHERE yr = 1999", cat)
    assert r["rows_deleted"] > 0
    v_after_delete = dl.table_version(path)
    r = sql(spark, "UPDATE orders_lake SET cents = cents + 7 "
                   "WHERE o_orderkey < 600", cat)
    assert r["rows_updated"] > 0
    sql(spark, "INSERT INTO orders_lake "
               "SELECT CAST(-1 AS BIGINT) AS o_orderkey, 1995 AS yr, "
               "12345 AS cents", cat)
    sql(spark, "OPTIMIZE orders_lake", cat)
    # time travel through SQL still sees the pre-update snapshot
    old = sql(spark, f"SELECT o_orderkey FROM orders_lake "
                     f"VERSION AS OF {v_after_delete} "
                     f"WHERE o_orderkey < 600", cat)
    now = sql(spark, "SELECT yr, cents FROM orders_lake", cat)
    return (
        now.groupBy("yr")
        .agg(F.count("*").alias("n_orders"),
             F.sum("cents").alias("total_cents"))
        .withColumn("n_pre_update_lowkeys", F.lit(old.count()))
        .orderBy("yr")
    )


LAKE_SQL_SURFACE_SQL = f"""
WITH final AS (
  SELECT EXTRACT(year FROM o_orderdate) AS yr,
         {sql_cents('o_totalprice')}
           + CASE WHEN o_orderkey < 600 THEN 7 ELSE 0 END AS cents
  FROM orders
  WHERE EXTRACT(year FROM o_orderdate) <> 1999
  UNION ALL
  SELECT 1995 AS yr, 12345 AS cents
)
SELECT CAST(yr AS INT) AS yr, COUNT(*) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       CAST((SELECT COUNT(*) FROM orders
             WHERE o_orderkey < 600
               AND EXTRACT(year FROM o_orderdate) <> 1999) AS INT)
         AS n_pre_update_lowkeys
FROM final GROUP BY yr ORDER BY yr
"""


def lake_copy_into(spark, sf_dir):
    """COPY INTO (sources/deltalite.py copy_into): Delta's idempotent
    bulk ingestion. A landing directory fills in three batches; COPY
    INTO runs after batch 2 and again (a) immediately — loading NOTHING
    (per-file exactly-once via log-recorded source paths, asserted) —
    and (b) after batch 3 lands — loading ONLY the new files. The
    oracle recomputes the final table from the source algebra, so the
    hash pins that the skip-set logic neither double-loads nor drops a
    file, across commits and checkpoints."""
    from pygdf_spark.sources import deltalite as dl

    base = T(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("yr"),
        cents("o_totalprice").alias("cents"),
    )
    landing = _tmp(sf_dir, "lake_landing")
    path = _tmp(sf_dir, "lake_copy")
    shutil.rmtree(landing, ignore_errors=True)
    shutil.rmtree(path, ignore_errors=True)
    base.filter(F.col("yr") <= 1997).filter(F.col("o_orderkey") % 2 == 0) \
        .write.parquet(os.path.join(landing, "batch0"))
    base.filter(F.col("yr") <= 1997).filter(F.col("o_orderkey") % 2 == 1) \
        .write.parquet(os.path.join(landing, "batch1"))
    glob_pat = os.path.join(landing, "batch*", "*.parquet")
    r1 = dl.copy_into(spark, path, glob_pat, stat_cols=["yr"])
    assert r1["files_loaded"] > 0
    r2 = dl.copy_into(spark, path, glob_pat)
    assert r2["files_loaded"] == 0 and r2["files_skipped"] > 0, \
        "COPY INTO re-run must load nothing"
    base.filter(F.col("yr") >= 1998) \
        .write.parquet(os.path.join(landing, "batch2"))
    r3 = dl.copy_into(spark, path, glob_pat)
    assert r3["files_loaded"] > 0 and r3["files_skipped"] >= \
        r1["files_loaded"], "growing-directory re-run loads only new files"
    snap = dl.read_table(spark, path)
    return (
        snap.groupBy("yr")
        .agg(F.count("*").alias("n_orders"),
             F.sum("cents").alias("total_cents"))
        .orderBy("yr")
    )


LAKE_COPY_INTO_SQL = f"""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
       COUNT(*) AS n_orders,
       CAST(SUM({sql_cents('o_totalprice')}) AS BIGINT) AS total_cents
FROM orders GROUP BY 1 ORDER BY yr
"""


QUERIES = {
    "lake_partition_prune": lake_partition_prune,
    "lake_partition_evolution": lake_partition_evolution,
    "lake_sql_surface": lake_sql_surface,
    "lake_copy_into": lake_copy_into,
    "lake_update_where": lake_update_where,
    "lake_replace_where": lake_replace_where,
    "lake_incremental_lsh": lake_incremental_lsh,
    "lake_bloom_skip": lake_bloom_skip,
    "lake_delete_dv": lake_delete_dv,
    "lake_restore": lake_restore,
    "lake_incremental_matview": lake_incremental_matview,
    "lake_change_feed": lake_change_feed,
    "lake_zorder_skip": lake_zorder_skip,
    "lake_merge_upsert": lake_merge_upsert,
    "lake_snapshot_read": lake_snapshot_read,
    "lake_time_travel": lake_time_travel,
    "lake_file_skipping": lake_file_skipping,
}

def lake_column_mapping(spark, sf_dir):
    """Metadata-only schema evolution (sources/deltalite.py
    rename_column/drop_column — the Delta column-mapping analog): land
    half of orders, RENAME cents→price_cents and DROP o_orderstatus
    (both asserted zero-data-movement: the live file set is
    bit-identical before and after), then append the other half under
    the NEW logical schema. The final read must show exactly the
    logical columns with every row intact — physical bytes still carry
    the old names, translated at the scan boundary. Oracle: the same
    aggregate over ALL of orders (the rename/drop is pure metadata, so
    the row set equals the two appends' union)."""
    from pygdf_spark.sources import deltalite as dl

    base = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        cents("o_totalprice").alias("cents"),
    )
    path = _tmp(sf_dir, "lake_colmap")
    shutil.rmtree(path, ignore_errors=True)
    n = _shards_src(sf_dir, "orders")
    dl.append(base.filter("o_orderkey % 2 = 0").repartition(n), path,
              stat_cols=["o_orderkey"])
    before = {a["path"] for a in dl.live_files(path)}
    dl.rename_column(path, "cents", "price_cents")
    dl.drop_column(path, "o_orderstatus")
    after = {a["path"] for a in dl.live_files(path)}
    assert before == after, "rename/drop must move zero data files"
    dl.append(
        base.filter("o_orderkey % 2 = 1").repartition(n)
        .withColumnRenamed("cents", "price_cents").drop("o_orderstatus"),
        path, stat_cols=["o_orderkey"],
    )
    snap = dl.read_table(spark, path)
    assert sorted(snap.columns) == ["o_custkey", "o_orderkey",
                                    "price_cents"]
    # logical-name predicates still prune from physical stats
    sel, total = dl.plan_files(path, predicate=[("o_orderkey", "<", 0)])
    assert len(sel) == 0 and total > 0
    return (
        snap.groupBy((F.col("o_orderkey") % 7).alias("bucket"))
        .agg(F.count("*").alias("n_orders"),
             F.sum("price_cents").alias("sum_price_cents"))
        .orderBy("bucket")
    )


LAKE_COLUMN_MAPPING_SQL = f"""
SELECT o_orderkey % 7 AS bucket, COUNT(*) AS n_orders,
       CAST(SUM({sql_cents('o_totalprice')}) AS BIGINT) AS sum_price_cents
FROM orders GROUP BY 1 ORDER BY 1
"""


def lake_shallow_clone(spark, sf_dir):
    """SHALLOW CLONE (sources/deltalite.py clone): zero-copy snapshot —
    the clone's add actions reference the source's bytes absolutely
    (asserted: the clone directory owns NO data files), then the two
    tables DIVERGE: a DV takedown on the clone (keys < 600) and a
    copy-on-write UPDATE on the source (cents+10 for keys < 300),
    neither visible to the other. Result: a side-tagged aggregate over
    both tables; the oracle re-expresses each side algebraically over
    the original orders rows."""
    from pygdf_spark.sources import deltalite as dl

    base = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", cents("o_totalprice").alias("cents"),
    )
    src_t = _tmp(sf_dir, "lake_clone_src")
    dst_t = _tmp(sf_dir, "lake_clone_dst")
    shutil.rmtree(src_t, ignore_errors=True)
    shutil.rmtree(dst_t, ignore_errors=True)
    n = _shards_src(sf_dir, "orders")
    dl.append(base, src_t, stat_cols=["o_orderkey"],
              cluster_by=["o_orderkey"], target_files=n)
    dl.clone(src_t, dst_t)
    owned = [
        f for _d, _s, fs in os.walk(os.path.join(dst_t, "data"))
        for f in fs
    ] if os.path.isdir(os.path.join(dst_t, "data")) else []
    assert owned == [], "shallow clone must own zero data files"
    dl.delete_where(spark, dst_t, [("o_orderkey", "<", 600)], mode="dv")
    dl.update_where(spark, src_t, [("o_orderkey", "<", 300)],
                    {"cents": "cents + 10"}, stat_cols=["o_orderkey"])
    both = (
        dl.read_table(spark, src_t).withColumn("side", F.lit("src"))
        .unionByName(
            dl.read_table(spark, dst_t).withColumn("side", F.lit("clone"))
        )
    )
    return (
        both.groupBy("side", "o_orderstatus")
        .agg(F.count("*").alias("n_orders"),
             F.sum("cents").alias("total_cents"))
        .orderBy("side", "o_orderstatus")
    )


LAKE_SHALLOW_CLONE_SQL = f"""
WITH src AS (
  SELECT 'src' AS side, o_orderstatus,
         {sql_cents('o_totalprice')}
         + CASE WHEN o_orderkey < 300 THEN 10 ELSE 0 END AS cents
  FROM orders
), cl AS (
  SELECT 'clone' AS side, o_orderstatus, {sql_cents('o_totalprice')} AS cents
  FROM orders WHERE o_orderkey >= 600
), u AS (
  SELECT * FROM src UNION ALL SELECT * FROM cl
)
SELECT side, o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS total_cents
FROM u GROUP BY side, o_orderstatus ORDER BY side, o_orderstatus
"""


QUERIES["lake_column_mapping"] = lake_column_mapping
QUERIES["lake_shallow_clone"] = lake_shallow_clone

def lake_type_widening(spark, sf_dir):
    """Metadata-only type widening (sources/deltalite.py widen_column):
    land even-key orders with INT cents, ALTER COLUMN TYPE to BIGINT
    (asserted zero-data-movement), then append odd-key rows whose
    values exceed the int32 range — the mixed narrow/wide-era table
    every long-lived production table becomes. The read must upcast
    the narrow era at scan time and aggregate exactly; oracle is the
    same algebra over all of orders."""
    from pygdf_spark.sources import deltalite as dl

    base = T(spark, sf_dir, "orders").select(
        "o_orderkey", cents("o_totalprice").alias("v")
    )
    path = _tmp(sf_dir, "lake_widen")
    shutil.rmtree(path, ignore_errors=True)
    n = _shards_src(sf_dir, "orders")
    dl.append(
        base.filter("o_orderkey % 2 = 0")
        .withColumn("v", F.col("v").cast("int")).repartition(n),
        path, stat_cols=["o_orderkey"],
    )
    before = {a["path"] for a in dl.live_files(path)}
    dl.widen_column(path, "v", "long")
    assert {a["path"] for a in dl.live_files(path)} == before, \
        "widening must move zero data files"
    dl.append(
        base.filter("o_orderkey % 2 = 1")
        .withColumn("v", F.col("v") + F.lit(3_000_000_000)).repartition(n),
        path, stat_cols=["o_orderkey"],
    )
    snap = dl.read_table(spark, path)
    assert dict(snap.dtypes)["v"] == "bigint"
    return (
        snap.groupBy((F.col("o_orderkey") % 5).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.sum("v").alias("sum_v"))
        .orderBy("bucket")
    )


LAKE_TYPE_WIDENING_SQL = f"""
SELECT o_orderkey % 5 AS bucket, COUNT(*) AS n_orders,
       CAST(SUM({sql_cents('o_totalprice')}
                + CASE WHEN o_orderkey % 2 = 1
                       THEN 3000000000 ELSE 0 END) AS BIGINT) AS sum_v
FROM orders GROUP BY 1 ORDER BY 1
"""


QUERIES["lake_type_widening"] = lake_type_widening

ORACLE = {
    "lake_type_widening": LAKE_TYPE_WIDENING_SQL,
    "lake_column_mapping": LAKE_COLUMN_MAPPING_SQL,
    "lake_shallow_clone": LAKE_SHALLOW_CLONE_SQL,
    "lake_partition_prune": LAKE_PARTITION_PRUNE_SQL,
    "lake_partition_evolution": LAKE_PARTITION_EVOLUTION_SQL,
    "lake_sql_surface": LAKE_SQL_SURFACE_SQL,
    "lake_copy_into": LAKE_COPY_INTO_SQL,
    "lake_update_where": LAKE_UPDATE_WHERE_SQL,
    "lake_replace_where": LAKE_REPLACE_WHERE_SQL,
    "lake_incremental_lsh": _lake_lsh_sql(),
    "lake_bloom_skip": LAKE_BLOOM_SQL,
    "lake_delete_dv": LAKE_DELETE_DV_SQL,
    "lake_restore": LAKE_RESTORE_SQL,
    "lake_incremental_matview": LAKE_MATVIEW_SQL,
    "lake_change_feed": LAKE_CDF_SQL,
    "lake_zorder_skip": LAKE_ZORDER_SQL,
    "lake_merge_upsert": LAKE_MERGE_SQL,
    "lake_snapshot_read": LAKE_SNAPSHOT_SQL,
    "lake_time_travel": LAKE_TIME_TRAVEL_SQL,
    "lake_file_skipping": LAKE_SKIPPING_SQL,
}
