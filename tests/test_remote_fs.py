"""GCS/HDFS remote-FS tier — the last untested §2.1 partial row
(reference python/cudf/cudf/tests/test_gcs.py, test_hdfs.py).

gs:// is exercised END-TO-END through the GCS S3-interoperability
fallback with a moto server playing the interop endpoint (the same
pattern as tests/test_s3_smoke.py — the code path under test is ours,
the network is mocked). hdfs:// pins the documented gate behavior: a
loud, specific error naming the native route, never a silent decay
into FileNotFoundError.
"""

from __future__ import annotations

import io as _io
import os

import pytest

moto = pytest.importorskip("moto")
boto3 = pytest.importorskip("boto3")

from pygdf_spark.sources.io import read_csv, read_parquet, write_parquet
from pygdf_spark.sources.remote_fs import (
    hdfs_localize,
    is_remote_path,
    remote_localize,
)

BUCKET = "pygdf-gs-bucket"


@pytest.fixture(scope="module")
def gs_env():
    from moto.server import ThreadedMotoServer

    srv = ThreadedMotoServer(port=0)
    srv.start()
    port = srv._server.socket.getsockname()[1]
    endpoint = f"http://127.0.0.1:{port}"
    old = {k: os.environ.get(k) for k in (
        "GCS_ENDPOINT_URL", "GCS_ACCESS_KEY_ID", "GCS_SECRET_ACCESS_KEY")}
    os.environ.update({
        "GCS_ENDPOINT_URL": endpoint,
        "GCS_ACCESS_KEY_ID": "testing",
        "GCS_SECRET_ACCESS_KEY": "testing",
    })
    client = boto3.client(
        "s3", endpoint_url=endpoint,
        aws_access_key_id="testing", aws_secret_access_key="testing",
        region_name="us-east-1",
    )
    client.create_bucket(Bucket=BUCKET)
    yield client
    for k, v in old.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v
    srv.stop()


def test_scheme_dispatch():
    assert is_remote_path("gs://b/k")
    assert is_remote_path("hdfs://nn:9000/p")
    assert is_remote_path("s3://b/k")
    assert not is_remote_path("/local/path")
    with pytest.raises(ValueError, match="not a remote"):
        remote_localize("/local/path")


def test_read_parquet_gs(spark, gs_env):
    import pyarrow as pa
    import pyarrow.parquet as pq

    buf = _io.BytesIO()
    pq.write_table(pa.table({"k": [1, 2, 3], "v": ["a", "b", "c"]}), buf)
    gs_env.put_object(Bucket=BUCKET, Key="in/part-0.parquet",
                      Body=buf.getvalue())
    df = read_parquet(spark, f"gs://{BUCKET}/in", columns=["k"],
                      filters="k > 1")
    assert sorted(r["k"] for r in df.collect()) == [2, 3]


def test_read_csv_gs(spark, gs_env):
    gs_env.put_object(Bucket=BUCKET, Key="csv/data.csv",
                      Body=b"a,b\n1,x\n2,y\n")
    df = read_csv(spark, f"gs://{BUCKET}/csv/data.csv")
    assert sorted((int(r["a"]), r["b"]) for r in df.collect()) == [
        (1, "x"), (2, "y")]


def test_write_parquet_gs_roundtrip(spark, gs_env):
    src = spark.createDataFrame(
        [(i, f"n{i}") for i in range(8)], "k int, name string")
    write_parquet(src, f"gs://{BUCKET}/out/table")
    keys = [o["Key"] for o in gs_env.list_objects_v2(
        Bucket=BUCKET, Prefix="out/table/")["Contents"]]
    assert any(k.endswith(".parquet") for k in keys)
    back = read_parquet(spark, f"gs://{BUCKET}/out/table")
    assert sorted(r["k"] for r in back.collect()) == list(range(8))


def test_gs_env_restored_after_localize(gs_env):
    """The interop retarget must not leak the GCS endpoint into the
    ambient AWS env (an s3:// read right after a gs:// read would
    otherwise hit the wrong store)."""
    before = os.environ.get("AWS_ENDPOINT_URL")
    gs_env.put_object(Bucket=BUCKET, Key="one/a.csv", Body=b"x\n1\n")
    remote_localize(f"gs://{BUCKET}/one/a.csv")
    assert os.environ.get("AWS_ENDPOINT_URL") == before


def test_hdfs_gate_is_loud_and_specific():
    """No libhdfs / no namenode in this sandbox: the gate must raise an
    actionable error naming the native route — pinned so the fallback
    never decays into a misleading FileNotFoundError."""
    with pytest.raises(Exception) as ei:
        hdfs_localize("hdfs://no-such-namenode:9000/data")
    assert not isinstance(ei.value, FileNotFoundError)
    msg = str(ei.value)
    assert "hdfs" in msg.lower()
