"""S3 object-store access — the remote-FS row of SURVEY.md §2.1.

Reference parity: the reference reads s3:// paths through fsspec
(python/cudf/cudf/io/*, tests/test_s3.py). On Spark the PRIMARY path is
the Hadoop ``s3a://`` connector: zero Python involvement, and the scan
keeps split planning, predicate pushdown, and column pruning inside the
native readers — at 100 TB that connector IS the design, and this repo
deliberately adds no Python shim in front of it.

This module is the JAR-LESS FALLBACK (hadoop-aws is not on this
sandbox's classpath) plus the test harness that makes the remote-FS row
a *tested* row instead of an untested passthrough claim:

- reads: localize ``s3://bucket/prefix`` to a driver-local staging dir
  via boto3 (paginated list + ranged gets), then hand the LOCAL path to
  the native Spark reader — pushdown/pruning still apply to the
  localized files;
- writes: stage the Spark write to a local temp dir, then upload each
  part object with single-part PUTs.

Localization moves bytes through one host, so the fallback is bounded
to small/medium tables by design and says so loudly; production-scale
IO belongs to the connector. Endpoint/credentials resolve from the
standard AWS env (AWS_ENDPOINT_URL honored — which is also how the
moto-backed smoke test in tests/test_s3_smoke.py wires itself in).
"""

from __future__ import annotations

import os
import tempfile


def _client():
    try:
        import boto3
    except ImportError as e:  # pragma: no cover - boto3 ships in-image
        raise ImportError(
            "s3:// fallback needs boto3 (or add hadoop-aws to the Spark "
            "classpath for the native s3a:// path)"
        ) from e
    endpoint = os.environ.get("AWS_ENDPOINT_URL")
    return boto3.client("s3", endpoint_url=endpoint)


def _split(path: str) -> tuple[str, str]:
    """``s3://bucket/key`` or ``s3a://bucket/key`` → (bucket, key)."""
    for scheme in ("s3://", "s3a://", "s3n://"):
        if path.startswith(scheme):
            rest = path[len(scheme):]
            bucket, _, key = rest.partition("/")
            if not bucket:
                raise ValueError(f"no bucket in {path!r}")
            return bucket, key
    raise ValueError(f"not an s3 path: {path!r}")


def is_s3_path(path) -> bool:
    return isinstance(path, str) and path.startswith(("s3://", "s3a://", "s3n://"))


def s3_localize(path: str) -> str:
    """Download an object or prefix into a fresh driver-local staging
    dir; returns the local path (file for a single exact-key object,
    directory for a prefix). Driver-bounded by design — see module doc."""
    bucket, key = _split(path)
    c = _client()
    stage = tempfile.mkdtemp(prefix="pygdf_s3_")
    # exact single object? Only a missing-key response falls through to
    # the prefix listing — an auth/endpoint/network failure must NOT be
    # swallowed into a misleading FileNotFoundError downstream.
    if key and not key.endswith("/"):
        try:
            c.head_object(Bucket=bucket, Key=key)
            exists = True
        except Exception as e:
            code = str(
                getattr(e, "response", {}).get("Error", {}).get("Code", "")
            )
            if code in ("404", "NoSuchKey", "NotFound"):
                exists = False
            else:
                raise
        if exists:
            local = os.path.join(stage, os.path.basename(key) or "object")
            c.download_file(bucket, key, local)
            return local
    prefix = key.rstrip("/")
    pages = c.get_paginator("list_objects_v2").paginate(
        Bucket=bucket, Prefix=prefix + "/" if prefix else "")
    n = 0
    for page in pages:
        for obj in page.get("Contents", []):
            if obj["Key"].endswith("/"):
                continue  # zero-byte directory-marker objects
            rel = obj["Key"][len(prefix):].lstrip("/") if prefix else obj["Key"]
            if not rel:
                continue
            local = os.path.join(stage, rel)
            # bucket listings are UNTRUSTED content: a key containing
            # ".." must not write outside the staging dir
            if not os.path.realpath(local).startswith(
                os.path.realpath(stage) + os.sep
            ):
                raise ValueError(
                    f"s3 key escapes the staging dir: {obj['Key']!r}")
            os.makedirs(os.path.dirname(local), exist_ok=True)
            c.download_file(bucket, obj["Key"], local)
            n += 1
    if n == 0:
        raise FileNotFoundError(f"no objects under {path}")
    return stage


def s3_upload(local: str, path: str) -> int:
    """Upload a local file or directory tree to ``s3://bucket/key``;
    returns the number of objects written (single-part PUTs)."""
    bucket, key = _split(path)
    c = _client()
    if os.path.isfile(local):
        c.upload_file(local, bucket, key)
        return 1
    n = 0
    for root, _dirs, files in os.walk(local):
        for fname in files:
            if fname.startswith((".", "_")) and not fname.startswith("part"):
                continue  # Spark _SUCCESS / .crc sidecars
            full = os.path.join(root, fname)
            rel = os.path.relpath(full, local)
            c.upload_file(full, bucket, f"{key.rstrip('/')}/{rel}")
            n += 1
    return n
