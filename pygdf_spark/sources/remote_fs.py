"""GCS / HDFS remote-filesystem access — the last untested §2.1 row.

Reference parity: python/cudf/cudf/tests/test_gcs.py and test_hdfs.py
(fsspec-backed reads over gs:// and hdfs:// paths).

On Spark the PRIMARY path for both schemes is the native Hadoop
connector (gcs-connector jar for ``gs://``; HDFS is Hadoop's own
filesystem, wired by ``core-site.xml``): zero Python involvement, split
planning and pushdown stay in the JVM — at 100 TB that connector IS the
design, same contract as ``sources/s3.py``. This module is the jar-less
fallback plus what makes each scheme a *tested* row:

- ``gs://`` — localized through the SAME boto3 machinery as s3://,
  pointed at GCS's public S3-INTEROPERABILITY XML API
  (https://storage.googleapis.com with HMAC credentials — a documented
  GCS feature, not a trick). ``GCS_ENDPOINT_URL`` overrides the
  endpoint, which is also how the moto-backed test wires itself in;
  ``GCS_ACCESS_KEY_ID``/``GCS_SECRET_ACCESS_KEY`` carry the HMAC pair
  (falling back to the AWS vars when unset).
- ``hdfs://`` — localized through ``pyarrow.fs.HadoopFileSystem``
  (libhdfs). The sandbox has neither libhdfs nor a namenode, so the
  gate raises a loud, specific error naming both the native route and
  the missing dependency; the gate behavior itself is pytest-pinned
  (a silent decay into FileNotFoundError would misdiagnose as missing
  data).

Localization moves bytes through one host — bounded to small/medium
tables by design, exactly like the s3 fallback contract.
"""

from __future__ import annotations

import os
import tempfile


def is_gs_path(path) -> bool:
    return isinstance(path, str) and path.startswith("gs://")


def is_hdfs_path(path) -> bool:
    return isinstance(path, str) and path.startswith("hdfs://")


def is_remote_path(path) -> bool:
    from pygdf_spark.sources.s3 import is_s3_path

    return is_s3_path(path) or is_gs_path(path) or is_hdfs_path(path)


def _gs_env() -> dict:
    """Endpoint + HMAC credential resolution for the GCS interop API."""
    return {
        "AWS_ENDPOINT_URL": os.environ.get(
            "GCS_ENDPOINT_URL", "https://storage.googleapis.com"
        ),
        "AWS_ACCESS_KEY_ID": os.environ.get(
            "GCS_ACCESS_KEY_ID", os.environ.get("AWS_ACCESS_KEY_ID", "")
        ),
        "AWS_SECRET_ACCESS_KEY": os.environ.get(
            "GCS_SECRET_ACCESS_KEY",
            os.environ.get("AWS_SECRET_ACCESS_KEY", ""),
        ),
    }


class _gs_interop:
    """Temporarily retarget the s3 client env at the GCS interop
    endpoint (the s3 module reads the standard AWS vars)."""

    def __enter__(self):
        self._old = {k: os.environ.get(k) for k in (
            "AWS_ENDPOINT_URL", "AWS_ACCESS_KEY_ID", "AWS_SECRET_ACCESS_KEY"
        )}
        os.environ.update(_gs_env())
        return self

    def __exit__(self, *exc):
        for k, v in self._old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def gs_localize(path: str) -> str:
    """Download ``gs://bucket/prefix`` to a local staging dir via the
    GCS S3-interop API; returns the local path. Reuses the s3 fallback
    (paginated list, traversal guard, loud auth errors) verbatim."""
    from pygdf_spark.sources.s3 import s3_localize

    with _gs_interop():
        return s3_localize("s3://" + path[len("gs://"):])


def gs_upload(local: str, path: str) -> int:
    from pygdf_spark.sources.s3 import s3_upload

    with _gs_interop():
        return s3_upload(local, "s3://" + path[len("gs://"):])


def hdfs_localize(path: str) -> str:
    """Copy ``hdfs://host:port/path`` to a local staging dir via
    pyarrow's libhdfs binding. Raises a specific, actionable error when
    the binding or cluster is absent — never a bare FileNotFoundError."""
    try:
        from pyarrow import fs as pafs
    except ImportError as e:  # pragma: no cover - pyarrow ships in-image
        raise ImportError("hdfs:// fallback needs pyarrow") from e
    try:
        hdfs, inner = pafs.FileSystem.from_uri(path)
    except Exception as e:
        raise RuntimeError(
            f"hdfs:// localization unavailable: {e}. The production "
            "route is Spark's native Hadoop client (configure "
            "fs.defaultFS / core-site.xml); the Python fallback needs "
            "libhdfs (pyarrow.fs.HadoopFileSystem) and a reachable "
            "namenode."
        ) from e
    stage = tempfile.mkdtemp(prefix="pygdf_hdfs_")
    info = hdfs.get_file_info(inner)
    from pyarrow.fs import FileSelector, FileType

    def _copy(src: str, dst: str) -> None:
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        with hdfs.open_input_stream(src) as r, open(dst, "wb") as w:
            while True:
                chunk = r.read(4 << 20)
                if not chunk:
                    break
                w.write(chunk)

    if info.type == FileType.File:
        local = os.path.join(stage, os.path.basename(inner))
        _copy(inner, local)
        return local
    n = 0
    for f in hdfs.get_file_info(FileSelector(inner, recursive=True)):
        if f.type != FileType.File:
            continue
        rel = os.path.relpath(f.path, inner)
        local = os.path.join(stage, rel)
        if not os.path.realpath(local).startswith(
            os.path.realpath(stage) + os.sep
        ):
            raise ValueError(f"hdfs path escapes staging dir: {f.path!r}")
        _copy(f.path, local)
        n += 1
    if n == 0:
        raise FileNotFoundError(f"no files under {path}")
    return stage


def remote_localize(path: str) -> str:
    """Scheme dispatch for the jar-less localization fallback."""
    from pygdf_spark.sources.s3 import is_s3_path, s3_localize

    if is_s3_path(path):
        return s3_localize(path)
    if is_gs_path(path):
        return gs_localize(path)
    if is_hdfs_path(path):
        return hdfs_localize(path)
    raise ValueError(f"not a remote path: {path!r}")


def remote_upload(local: str, path: str) -> int:
    from pygdf_spark.sources.s3 import is_s3_path, s3_upload

    if is_s3_path(path):
        return s3_upload(local, path)
    if is_gs_path(path):
        return gs_upload(local, path)
    raise ValueError(
        f"no jar-less upload fallback for {path!r} (hdfs writes need "
        "the native Hadoop client)"
    )
