"""Remote-FS (S3) smoke tier — VERDICT r5 Next #8.

Reference parity: python/cudf/cudf/tests/test_s3.py (moto-backed
read_csv/read_parquet over s3:// paths). Here a ThreadedMotoServer plays
S3, wired through the standard AWS env (AWS_ENDPOINT_URL + creds), and
the SAME ``sources/io.py`` entry points used everywhere else are driven
with ``s3://`` URIs — exercising the jar-less boto3 localization
fallback end-to-end (the hadoop-aws native path cannot run in this
sandbox; the fallback contract is documented in sources/s3.py).
"""

from __future__ import annotations

import io as _io
import os

import pytest

moto = pytest.importorskip("moto")
boto3 = pytest.importorskip("boto3")

from pygdf_spark.sources.io import read_csv, read_parquet, write_csv, write_parquet

BUCKET = "pygdf-test-bucket"


@pytest.fixture(scope="module")
def s3_env():
    from moto.server import ThreadedMotoServer

    srv = ThreadedMotoServer(port=0)
    srv.start()
    port = srv._server.socket.getsockname()[1]
    endpoint = f"http://127.0.0.1:{port}"
    old = {k: os.environ.get(k) for k in (
        "AWS_ENDPOINT_URL", "AWS_ACCESS_KEY_ID", "AWS_SECRET_ACCESS_KEY",
        "AWS_DEFAULT_REGION")}
    os.environ.update({
        "AWS_ENDPOINT_URL": endpoint,
        "AWS_ACCESS_KEY_ID": "testing",
        "AWS_SECRET_ACCESS_KEY": "testing",
        "AWS_DEFAULT_REGION": "us-east-1",
    })
    client = boto3.client("s3", endpoint_url=endpoint)
    client.create_bucket(Bucket=BUCKET)
    yield client
    for k, v in old.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v
    srv.stop()


def test_read_parquet_s3(spark, s3_env):
    import pyarrow as pa
    import pyarrow.parquet as pq

    buf = _io.BytesIO()
    pq.write_table(pa.table({"k": [1, 2, 3], "v": ["a", "b", "c"]}), buf)
    s3_env.put_object(Bucket=BUCKET, Key="in/part-0.parquet", Body=buf.getvalue())
    s3_env.put_object(Bucket=BUCKET, Key="in/part-1.parquet", Body=buf.getvalue())

    df = read_parquet(spark, f"s3://{BUCKET}/in", columns=["k"], filters="k > 1")
    got = sorted(r["k"] for r in df.collect())
    assert got == [2, 2, 3, 3]


def test_read_csv_s3(spark, s3_env):
    s3_env.put_object(Bucket=BUCKET, Key="csv/data.csv",
                      Body=b"a,b\n1,x\n2,y\n3,z\n")
    df = read_csv(spark, f"s3://{BUCKET}/csv/data.csv")
    rows = sorted((int(r["a"]), r["b"]) for r in df.collect())
    assert rows == [(1, "x"), (2, "y"), (3, "z")]


def test_write_parquet_s3_roundtrip(spark, s3_env):
    src = spark.createDataFrame([(i, f"n{i}") for i in range(10)], "k int, name string")
    write_parquet(src, f"s3://{BUCKET}/out/table")
    keys = [o["Key"] for o in s3_env.list_objects_v2(
        Bucket=BUCKET, Prefix="out/table/")["Contents"]]
    assert any(k.endswith(".parquet") for k in keys)
    back = read_parquet(spark, f"s3://{BUCKET}/out/table")
    assert sorted(r["k"] for r in back.collect()) == list(range(10))


def test_write_csv_s3_roundtrip(spark, s3_env):
    src = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    write_csv(src, f"s3://{BUCKET}/out/csvdir")
    back = read_csv(spark, f"s3://{BUCKET}/out/csvdir")
    assert sorted((int(r["k"]), r["v"]) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_s3_localize_dir_marker_and_traversal_guard(s3_env):
    """r6 review pins: zero-byte directory-marker keys are skipped (they
    used to crash download_file), and a key containing '..' must not
    write outside the staging dir (bucket listings are untrusted)."""
    from pygdf_spark.sources.s3 import s3_localize

    s3_env.put_object(Bucket=BUCKET, Key="mk/", Body=b"")
    s3_env.put_object(Bucket=BUCKET, Key="mk/sub/", Body=b"")
    s3_env.put_object(Bucket=BUCKET, Key="mk/sub/a.txt", Body=b"hello")
    stage = s3_localize(f"s3://{BUCKET}/mk")
    with open(os.path.join(stage, "sub", "a.txt"), "rb") as f:
        assert f.read() == b"hello"

    s3_env.put_object(Bucket=BUCKET, Key="esc/ok.txt", Body=b"x")
    s3_env.put_object(Bucket=BUCKET, Key="esc/../../evil.txt", Body=b"x")
    try:
        s3_localize(f"s3://{BUCKET}/esc")
    except ValueError as e:
        assert "escapes" in str(e)
    else:
        # some stores normalize the key server-side; then nothing to pin
        pass


def test_s3_localize_auth_errors_not_swallowed(s3_env, monkeypatch):
    """A non-404 failure (bad credentials, endpoint down) must surface,
    not decay into FileNotFoundError via the prefix fallback."""
    from pygdf_spark.sources.s3 import s3_localize

    monkeypatch.setenv("AWS_ENDPOINT_URL", "http://127.0.0.1:9")  # closed port
    import pytest as _pytest

    with _pytest.raises(Exception) as ei:
        s3_localize(f"s3://{BUCKET}/csv/data.csv")
    assert not isinstance(ei.value, FileNotFoundError)
