"""End-to-end lakehouse lifecycle on deltalite: the maintenance loop a
100 TB training-corpus table lives through.

Run: python examples/lakehouse_lifecycle.py [sf_dir]

  ingest (atomic appends) → CDC upsert (MERGE INTO) → incremental
  materialized view refresh → GDPR-style DELETE via deletion vectors
  (no file rewrites) → Change Data Feed audit → REORG PURGE →
  OPTIMIZE compaction → oops-ROLLBACK (RESTORE) → VACUUM.

Every step is one atomic, versioned commit; every read is a snapshot.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pygdf_spark import get_spark
from pygdf_spark.sources import deltalite as dl


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("lakehouse-demo")
    table = os.path.join(tempfile.gettempdir(), f"lake_demo_{os.getpid()}")
    shutil.rmtree(table, ignore_errors=True)

    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "event_id", "user_id", "event_type", "value"
    )

    # 1. ingest: two atomic appends, range-clustered for file skipping
    dl.append(events.filter("event_id % 2 = 0").repartition(4), table,
              stat_cols=["event_id"], cluster_by=["event_id"])
    dl.append(events.filter("event_id % 2 = 1").repartition(4), table,
              stat_cols=["event_id"], cluster_by=["event_id"])
    print(f"v{dl.table_version(table)}: ingested",
          dl.read_table(spark, table).count(), "rows")

    # 2. CDC upsert: every 11th event gets a value bump (MERGE INTO
    #    rewrites ONLY the files containing a matched key)
    updates = events.filter("event_id % 11 = 0").withColumn(
        "value", F.col("value") + 1
    )
    res = dl.merge_into(spark, table, updates, on="event_id",
                        stat_cols=["event_id"])
    print(f"v{res['version']}: merged — rewrote {res['files_rewritten']} of "
          f"{res['files_total']} files")

    # 3. DELETE one user's rows via deletion vectors: no data file is
    #    rewritten — an O(matches) position sidecar + metadata commit
    victim = events.agg(F.min("user_id")).first()[0]
    r = dl.delete_where(spark, table, [("user_id", "=", victim)])
    print(f"v{r['version']}: dv-deleted {r['rows_deleted']} rows across "
          f"{r['files_touched']} files (0 rewrites)")

    # 4. audit what changed, row-level, straight from the log
    feed = dl.table_changes(spark, table, r["version"] - 1, r["version"],
                            key="event_id")
    print("   change feed:", feed.groupBy("_change_type").count().collect())

    # 5. REORG PURGE materializes the vectors; OPTIMIZE compacts
    dl.purge_dv(spark, table, stat_cols=["event_id"])
    dl.compact(spark, table, num_files=2, stat_cols=["event_id"])
    print(f"v{dl.table_version(table)}: purged + compacted,",
          dl.read_table(spark, table).count(), "rows live")

    # 6. someone fat-fingers an overwrite... RESTORE rolls it back as a
    #    new versioned commit (the mistake stays in history)
    dl.overwrite(events.limit(10), table)
    oops = dl.table_version(table)
    dl.restore(table, oops - 1)
    print(f"v{dl.table_version(table)}: restored from the v{oops} oops —",
          dl.read_table(spark, table).count(), "rows back")

    # 7. reclaim space beyond the time-travel horizon
    deleted = dl.vacuum(table, keep_versions=3)
    print("vacuumed", len(deleted), "unreferenced files; history:",
          [h["operation"] for h in dl.history(table)])

    # 8. the table is also a registered Spark format: tail it as a
    #    stream (exactly-once version offsets) or snapshot-read it
    from pygdf_spark.streaming.lake_source import register

    register(spark)
    snap = spark.read.format("deltalite").option("path", table).load()
    print("via format('deltalite'):", snap.count(), "rows")

    # 9. schema evolution without touching a byte: RENAME is a pure
    #    metadata commit (physical names stay in the files; readers
    #    translate at the scan boundary), DROP retires the column and
    #    the next compact physically purges it
    dl.rename_column(table, "value", "amount")
    dl.drop_column(table, "event_type")
    print(f"v{dl.table_version(table)}: renamed+dropped —",
          dl.read_table(spark, table).columns)

    # 10. zero-copy SHALLOW CLONE for a dev/what-if sandbox: the clone
    #     owns no data files and its DML never touches the source
    clone_t = table + "_clone"
    shutil.rmtree(clone_t, ignore_errors=True)
    dl.clone(table, clone_t)
    dl.delete_where(spark, clone_t, [("user_id", "<", 10)], mode="dv")
    print("clone diverged:", dl.read_table(spark, clone_t).count(),
          "rows vs source", dl.read_table(spark, table).count())

    # 11. fence the table for older engine builds: an engine that does
    #     not implement a listed reader feature refuses to MIS-read
    dl.set_protocol(table, reader_features=["columnMapping",
                                            "deletionVectors"])
    print("protocol:", dl.table_protocol(table))

    # 12. PARTITION EVOLUTION: start unpartitioned, decide later that
    #     user_id buckets should partition new data — a pure metadata
    #     commit; old files stay readable, partition DML turns hybrid,
    #     and OPTIMIZE migrates the history into the current spec
    dl.set_partition_spec(table, ["bucket"], {"bucket": "user_id % 4"})
    dl.append(events.filter("event_id % 97 = 0").select(
        "event_id", "user_id", F.col("value").alias("amount")
    ), table)
    dl.compact(spark, table, stat_cols=["event_id"])  # migrate old eras
    print(f"v{dl.table_version(table)}: evolved to bucket-partitioned —",
          dl.show_partitions(spark, table)
            .select("bucket", "n_rows").collect())

    # 13. the same protocol from SQL strings — and COPY INTO: the
    #     idempotent landing-zone loop (re-runs load only new files)
    from pygdf_spark.sources.lakehouse_sql import sql as lsql

    landing = table + "_landing"
    shutil.rmtree(landing, ignore_errors=True)
    events.limit(40).write.parquet(os.path.join(landing, "drop1"))
    glob_pat = os.path.join(landing, "drop*", "*.parquet")
    t2 = table + "_sqldemo"
    shutil.rmtree(t2, ignore_errors=True)
    r = lsql(spark, f"COPY INTO {t2} FROM '{glob_pat}'")
    r2 = lsql(spark, f"COPY INTO {t2} FROM '{glob_pat}'")  # no-op
    lsql(spark, f"DELETE FROM {t2} WHERE event_type = 'view'")
    print("SQL surface: copied", r["files_loaded"], "files, re-run loaded",
          r2["files_loaded"], "—",
          lsql(spark, f"DESCRIBE DETAIL {t2}").collect()[0]["num_rows"],
          "rows after SQL DELETE")

    shutil.rmtree(landing, ignore_errors=True)
    shutil.rmtree(t2, ignore_errors=True)
    shutil.rmtree(clone_t, ignore_errors=True)
    shutil.rmtree(table, ignore_errors=True)


if __name__ == "__main__":
    main()
