"""deltalite as a REGISTERED SPARK DATA SOURCE (PySpark 4 Python
DataSource API): ``spark.readStream.format("deltalite")`` tails the
transaction log version-by-version with exactly-once offset tracking,
and ``spark.read.format("deltalite")`` snapshot-reads with deletion
vectors applied — the Delta-streaming-source semantics on the engine's
own table format, no JVM extension needed.

Semantics (mirrors the public Delta source contract):

- **Offsets are table versions.** ``initialOffset`` = -1 (or
  ``startingVersion``); ``latestOffset`` = the current committed
  version. Spark's own offset log makes recovery exactly-once: a
  restarted query re-plans exactly the un-committed version range.
- **Appends feed the stream**; compact/purge commits are pure metadata
  (skipped silently); overwrite/merge/delete commits RAISE unless
  ``skipChangeCommits=true`` (silently treating a rewrite as fresh
  rows would double-count — the Delta failure mode this option exists
  for).
- **One input partition per added file** — the parallelism of the
  micro-batch is the commit's file count; executors read their file
  with pyarrow and emit Arrow record batches (zero row-by-row Python).
- The BATCH reader applies deletion vectors per file (position-mask
  ``take`` on the Arrow table) and supports ``version`` time travel.

100 TB posture: planning is O(files-in-range) driver-side metadata
(the same cost the JVM Delta source pays); all data bytes move
executor-side as Arrow.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType


class _FilePart(InputPartition):
    def __init__(self, path: str, dv_paths: tuple = ()):
        self.path = path
        self.dv_paths = tuple(dv_paths)


def _read_arrow_with_dv(path: str, dv_paths: tuple):
    """Arrow table of one data file minus its deletion-vector
    positions (executor-side; no Spark imports)."""
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    if dv_paths:
        rel = "/".join(path.rsplit("/", 3)[1:])  # data/<commit>/<file>
        drop = set()
        for dv in dv_paths:
            sidecar = pq.read_table(dv, columns=["file", "pos"])
            files = sidecar.column("file").to_pylist()
            poss = sidecar.column("pos").to_pylist()
            drop.update(p for f, p in zip(files, poss) if f == rel)
        if drop:
            keep = [i for i in range(t.num_rows) if i not in drop]
            t = t.take(keep)
    return t


class DeltaliteStreamReader(DataSourceStreamReader):
    def __init__(self, table: str, skip_change_commits: bool):
        self.table = table
        self.skip_change_commits = skip_change_commits

    def initialOffset(self) -> dict:
        return {"version": -1}

    def latestOffset(self) -> dict:
        from pygdf_spark.sources import deltalite as dl

        return {"version": dl.table_version(self.table)}

    def partitions(self, start: dict, end: dict):
        from pygdf_spark.sources import deltalite as dl

        parts: list[_FilePart] = []
        for v in range(start["version"] + 1, end["version"] + 1):
            p = dl._version_path(self.table, v)
            if not os.path.exists(p):
                raise ValueError(
                    f"deltalite stream: version {v} vacuumed from the log"
                )
            actions = dl._read_actions(p)
            op = next(
                a["commit"]["operation"] for a in actions if "commit" in a
            )
            if op in ("compact", "purge"):
                continue  # pure metadata swap: no new logical rows
            if op != "append":
                if self.skip_change_commits:
                    continue
                raise ValueError(
                    f"deltalite stream: non-append commit v{v} ({op}) — "
                    "set skipChangeCommits=true to skip change commits, or "
                    "consume row-level changes via table_changes()"
                )
            for a in actions:
                if "add" in a:
                    parts.append(
                        _FilePart(os.path.join(self.table, a["add"]["path"]))
                    )
        return parts

    def read(self, partition: _FilePart):
        t = _read_arrow_with_dv(partition.path, partition.dv_paths)
        yield from t.to_batches()

    def commit(self, end: dict) -> None:
        pass  # Spark's offset log is the source of truth


class DeltaliteBatchReader(DataSourceReader):
    def __init__(self, table: str, version: int | None):
        self.table = table
        self.version = version

    def partitions(self):
        from pygdf_spark.sources import deltalite as dl

        adds, _ = dl.plan_adds(self.table, self.version)
        return [
            _FilePart(
                os.path.join(self.table, a["path"]),
                tuple(
                    os.path.join(self.table, d["path"])
                    for d in (a.get("dv") or [])
                ),
            )
            for a in adds
        ]

    def read(self, partition: _FilePart):
        t = _read_arrow_with_dv(partition.path, partition.dv_paths)
        yield from t.to_batches()


class DeltaliteDataSource(DataSource):
    """``spark.dataSource.register(DeltaliteDataSource)`` then
    ``spark.read.format("deltalite").option("path", t)`` /
    ``spark.readStream.format("deltalite").option("path", t)``."""

    @classmethod
    def name(cls) -> str:
        return "deltalite"

    def _table(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("deltalite: .option('path', <table dir>) required")
        return path

    def schema(self) -> StructType:
        from pygdf_spark.sources import deltalite as dl

        table = self._table()
        v = dl.table_version(table)
        if v < 0:
            raise FileNotFoundError(f"no such deltalite table: {table}")
        schema_json = dl._snapshot(table, v)["schema"]
        if not schema_json:
            raise FileNotFoundError(f"empty table with no schema: {table}")
        return StructType.fromJson(json.loads(schema_json))

    def reader(self, schema: StructType) -> DeltaliteBatchReader:
        v = self.options.get("version")
        return DeltaliteBatchReader(
            self._table(), int(v) if v is not None else None
        )

    def streamReader(self, schema: StructType) -> DeltaliteStreamReader:
        skip = str(
            self.options.get("skipchangecommits", "false")
        ).lower() == "true"
        return DeltaliteStreamReader(self._table(), skip)


def register(spark) -> None:
    """Idempotently register the 'deltalite' format on a session."""
    spark.dataSource.register(DeltaliteDataSource)
