"""S3-scheme I/O: io_utils against a moto-mocked S3 (mirrors
/root/reference/tests/test_s3.py), plus pins that the Spark loaders
pass non-local URIs through to Hadoop unmangled.
"""

import pytest

boto3 = pytest.importorskip("boto3")
moto = pytest.importorskip("moto")

from smashed_spark.sources.io_utils import (  # noqa: E402
    SmartPath,
    copy_directory,
    exists,
    open_file_for_read,
    open_file_for_write,
    recursively_list_files,
    remove_directory,
    remove_file,
    stream_file_for_read,
)

BUCKET = "mytestbucket"
KEY = "test.jsonl"
PREFIX = f"s3://{BUCKET}/{KEY}"
CONTENT = "This is a test\nWith multiple lines\nBye!"


@pytest.fixture()
def s3():
    with moto.mock_aws():
        client = boto3.client("s3", region_name="us-east-1")
        client.create_bucket(Bucket=BUCKET)
        yield client


def _put(client, key=KEY, body=CONTENT):
    client.put_object(Bucket=BUCKET, Key=key, Body=body)


def test_read_from_s3(s3):
    _put(s3)
    with open_file_for_read(PREFIX, client=s3) as f:
        assert f.read() == CONTENT


def test_read_bytes_from_s3(s3):
    _put(s3)
    with open_file_for_read(PREFIX, "rb", client=s3) as f:
        assert f.read() == CONTENT.encode()


def test_write_to_s3(s3):
    with open_file_for_write(PREFIX, client=s3) as f:
        f.write(CONTENT)
    got = s3.get_object(Bucket=BUCKET, Key=KEY)["Body"].read().decode()
    assert got == CONTENT


def test_stream_from_s3(s3):
    _put(s3)
    with stream_file_for_read(PREFIX, client=s3) as f:
        assert f.read() == CONTENT


def test_stream_lines_from_s3(s3):
    _put(s3)
    with stream_file_for_read(PREFIX, client=s3) as f:
        for la, lb in zip(f, CONTENT.split("\n")):
            assert la.strip() == lb


def test_exists_list_remove(s3):
    assert not exists(PREFIX, client=s3)
    for k in ("d/a.txt", "d/b.txt", "d/.hidden", "e/c.txt"):
        _put(s3, key=k, body="x")
    assert exists(f"s3://{BUCKET}/d/a.txt", client=s3)
    assert exists(f"s3://{BUCKET}/d", client=s3)  # prefix-dir
    listed = sorted(recursively_list_files(f"s3://{BUCKET}/d", client=s3))
    assert listed == [f"s3://{BUCKET}/d/a.txt", f"s3://{BUCKET}/d/b.txt"]
    remove_file(f"s3://{BUCKET}/d/a.txt", client=s3)
    assert not exists(f"s3://{BUCKET}/d/a.txt", client=s3)
    remove_directory(f"s3://{BUCKET}/d", client=s3)
    assert not exists(f"s3://{BUCKET}/d", client=s3)
    assert exists(f"s3://{BUCKET}/e/c.txt", client=s3)


def test_copy_directory_s3_local_roundtrip(s3, tmp_path):
    for k in ("src/a.txt", "src/sub/b.txt"):
        _put(s3, key=k, body=f"body:{k}")
    local = tmp_path / "down"
    copy_directory(f"s3://{BUCKET}/src", str(local), client=s3)
    assert (local / "a.txt").read_text() == "body:src/a.txt"
    assert (local / "sub/b.txt").read_text() == "body:src/sub/b.txt"
    copy_directory(str(local), f"s3://{BUCKET}/up", client=s3)
    back = s3.get_object(Bucket=BUCKET, Key="up/sub/b.txt")["Body"].read()
    assert back == b"body:src/sub/b.txt"


def test_local_paths_need_no_boto(tmp_path, monkeypatch):
    """Local round-trip must not touch boto3 at all."""
    import smashed_spark.sources.io_utils as iu

    monkeypatch.setattr(
        iu, "_client", lambda **kw: pytest.fail("boto3 used for local path")
    )
    p = tmp_path / "x" / "f.txt"
    with open_file_for_write(str(p)) as f:
        f.write(CONTENT)
    with open_file_for_read(str(p)) as f:
        assert f.read() == CONTENT
    with stream_file_for_read(str(p)) as f:
        assert [l.strip() for l in f] == CONTENT.split("\n")
    assert exists(str(p))
    assert list(recursively_list_files(str(tmp_path))) == [str(p)]
    remove_file(str(p))
    assert not exists(str(p))


def test_list_and_remove_do_not_sweep_sibling_prefixes(s3):
    """'data' must never match 'data2/...': the listing behind
    remove_directory/copy_directory anchors the prefix with '/'."""
    _put(s3, key="data/a.txt", body="x")
    _put(s3, key="data2/b.txt", body="y")
    listed = list(recursively_list_files(f"s3://{BUCKET}/data", client=s3))
    assert listed == [f"s3://{BUCKET}/data/a.txt"]
    remove_directory(f"s3://{BUCKET}/data", client=s3)
    assert exists(f"s3://{BUCKET}/data2/b.txt", client=s3)  # untouched


def test_local_filenames_with_url_metacharacters(tmp_path):
    """'#' and '?' are legal in local filenames and must not be
    urlparse-truncated into fragment/query."""
    p = tmp_path / "report#1?v=2.txt"
    with open_file_for_write(str(p)) as f:
        f.write("data")
    assert exists(str(p))
    with open_file_for_read(str(p)) as f:
        assert f.read() == "data"
    sp = SmartPath.parse(str(p))
    assert sp.local == str(p)


def test_smartpath_parse():
    sp = SmartPath.parse("s3://bucket/a/b.txt")
    assert sp.is_s3 and sp.bucket == "bucket" and sp.key == "a/b.txt"
    assert str(sp) == "s3://bucket/a/b.txt"
    assert SmartPath.parse("s3a://b/k").is_s3  # hadoop-style alias
    lp = SmartPath.parse("/tmp/x")
    assert not lp.is_s3 and lp.local == "/tmp/x"
    with pytest.raises(ValueError, match="unsupported scheme"):
        SmartPath.parse("ftp://host/x")


def test_loader_passes_scheme_uri_to_hadoop_unmangled(spark):
    """CsvLoaderMapper hands path URIs verbatim to the DataSource: a
    URI with an unregistered scheme must surface Hadoop's
    unknown-scheme error still carrying the scheme — proof no local
    normalization/mangling happened on the way (real deployments hit
    this code path with s3a:// first)."""
    from py4j.protocol import Py4JJavaError

    from smashed_spark.sources.loaders import CsvLoaderMapper

    paths_df = spark.createDataFrame(
        [("mockfs://bucket/data.csv",)], "p: string"
    )
    with pytest.raises(Py4JJavaError, match="mockfs"):
        CsvLoaderMapper("p").map(paths_df).collect()


def test_write_s3_rejects_append_and_exclusive_modes(s3):
    """ADVICE r4: mode='a' silently truncate-overwrote and mode='x'
    silently clobbered on s3 — both must raise instead of diverging
    from the local branch's semantics."""
    _put(s3, body="precious")
    for mode in ("a", "x", "ab", "w+"):
        with pytest.raises(ValueError, match="not supported for\\s+s3"):
            with open_file_for_write(PREFIX, mode, client=s3):
                pass
    # the object is untouched
    got = s3.get_object(Bucket=BUCKET, Key=KEY)["Body"].read().decode()
    assert got == "precious"


def test_compression_roundtrip_local(tmp_path):
    """gzip round-trip through compress_stream/decompress_stream and
    the open_compressed convenience, text and binary modes."""
    import gzip as gz

    from smashed_spark.sources.io_utils import (
        compress_stream,
        decompress_stream,
        open_compressed,
    )

    p = tmp_path / "m.jsonl.gz"
    with open_compressed(str(p), "wt") as f:
        f.write(CONTENT)
    # stdlib can read what we wrote (it is a real gzip member)
    with gz.open(p, "rt") as f:
        assert f.read() == CONTENT
    with open_compressed(str(p), "rt") as f:
        assert f.read() == CONTENT
    with open_compressed(str(p), "rb") as f:
        assert f.read() == CONTENT.encode()
    # wrapping an already-open byte stream directly
    with open(p, "rb") as raw:
        with decompress_stream(raw, "rt") as f:
            assert [ln.strip() for ln in f] == CONTENT.split("\n")
    # deterministic output (mtime pinned)
    buf1, buf2 = __import__("io").BytesIO(), __import__("io").BytesIO()
    for b in (buf1, buf2):
        with compress_stream(b, "wt") as f:
            f.write(CONTENT)
    assert buf1.getvalue() == buf2.getvalue()


def test_compression_concatenated_members_and_zlib(tmp_path):
    """Concatenated gzip members (cat a.gz b.gz — the layout Hadoop
    writers and the gzip CLI both produce) decode fully, and
    gzip=False reads raw zlib streams."""
    import gzip as gz
    import io
    import zlib

    from smashed_spark.sources.io_utils import decompress_stream

    two = gz.compress(b"hello ") + gz.compress(b"world")
    with decompress_stream(io.BytesIO(two), "rb") as f:
        assert f.read() == b"hello world"
    raw = zlib.compress(CONTENT.encode())
    with decompress_stream(io.BytesIO(raw), "rt", gzip=False) as f:
        assert f.read() == CONTENT


def test_compression_roundtrip_s3(s3):
    """open_compressed over s3:// — write buffers+PUTs one gzip
    object, read streams it back through the decompressor."""
    from smashed_spark.sources.io_utils import open_compressed

    path = f"s3://{BUCKET}/artifacts/m.jsonl.gz"
    with open_compressed(path, "wt", client=s3) as f:
        f.write(CONTENT)
    import gzip as gz

    obj = s3.get_object(Bucket=BUCKET, Key="artifacts/m.jsonl.gz")
    assert gz.decompress(obj["Body"].read()).decode() == CONTENT
    with open_compressed(path, "rt", client=s3) as f:
        assert f.read() == CONTENT


def test_jsonl_gz_loader_path(spark, tmp_path):
    """Data-scale .jsonl.gz goes through the Spark loader natively
    (Hadoop decodes gzip on executors — no driver-side helper in the
    path); the driver-side open_compressed writes a file Spark can
    read, closing the loop."""
    from smashed_spark.sources.io_utils import open_compressed
    from smashed_spark.sources.loaders import JsonlLoaderMapper

    p = tmp_path / "docs.jsonl.gz"
    with open_compressed(str(p), "wt") as f:
        f.write('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')
    paths_df = spark.createDataFrame([(str(p),)], "p: string")
    out = JsonlLoaderMapper("p").map(paths_df).orderBy("a").collect()
    assert [(r.a, r.b) for r in out] == [(1, "x"), (2, "y")]


def test_smartpath_algebra():
    """Path algebra parity with the reference MultiPath
    (multipath.py:22-148): `/` join, join(), parent/name, prefix
    subtraction, pathlib interop."""
    base = SmartPath.parse("s3://bucket/data")
    p = base / "2024" / "part-0.parquet"
    assert str(p) == "s3://bucket/data/2024/part-0.parquet"
    assert p.name == "part-0.parquet"
    assert str(p.parent) == "s3://bucket/data/2024"
    assert p.relative_to(base) == "2024/part-0.parquet"
    assert p - base == "2024/part-0.parquet"
    assert SmartPath.join("s3://b/x", "y", "z.txt").key == "x/y/z.txt"
    with pytest.raises(ValueError, match="fully-qualified"):
        base / "s3://other/abs"
    with pytest.raises(ValueError, match="not under"):
        p.relative_to("s3://other/data")
    lp = SmartPath.parse("/tmp/a") / "b.txt"
    assert str(lp) == "/tmp/a/b.txt"
    assert lp.as_path.name == "b.txt"
    with pytest.raises(ValueError, match="not a local path"):
        _ = p.as_path
    # leading-slash segments and trailing slashes normalize
    assert str(SmartPath.parse("s3://b/a/") / "/c") == "s3://b/a/c"


def test_relative_to_component_boundary():
    """'data' is not a prefix-parent of 'database/…' — containment is
    per path component."""
    import pytest as _pt

    from smashed_spark.sources.io_utils import SmartPath

    sp = SmartPath.parse("s3://b/database/file.txt")
    with _pt.raises(ValueError):
        sp.relative_to("s3://b/data")
    assert sp.relative_to("s3://b/database") == "file.txt"
    with _pt.raises(ValueError):
        SmartPath.parse("/tmp/abc/f").relative_to("/tmp/ab")


def test_upload_on_success_success_and_failure(s3, tmp_path):
    from smashed_spark.sources.io_utils import upload_on_success

    remote = f"s3://{BUCKET}/results/run1"
    with upload_on_success(remote, client=s3) as path:
        with open(f"{path}/model.txt", "w") as fh:
            fh.write("weights")
        staged = path
    with open_file_for_read(f"{remote}/model.txt", client=s3) as fh:
        assert fh.read() == "weights"
    assert not __import__("os").path.exists(staged)  # temp dir swept

    # failure path: NOTHING uploads, the exception propagates
    remote2 = f"s3://{BUCKET}/results/run2"
    with pytest.raises(RuntimeError, match="boom"):
        with upload_on_success(remote2, client=s3) as path:
            with open(f"{path}/partial.txt", "w") as fh:
                fh.write("junk")
            raise RuntimeError("boom")
    assert list(recursively_list_files(
        f"s3://{BUCKET}/results/run2", s3)) == []


def test_upload_on_success_decorator_and_keep_local(s3, tmp_path):
    import os

    from smashed_spark.sources.io_utils import upload_on_success

    remote = f"s3://{BUCKET}/results/deco"

    @upload_on_success(remote, client=s3)
    def job(path, content):
        with open(os.path.join(path, "out.txt"), "w") as fh:
            fh.write(content)
        return "done"

    assert job("hello") == "done"
    with open_file_for_read(f"{remote}/out.txt", client=s3) as fh:
        assert fh.read() == "hello"

    # explicit local_path + keep_local survives the exit
    local = str(tmp_path / "stage")
    remote3 = f"s3://{BUCKET}/results/kept"
    with upload_on_success(remote3, local_path=local, keep_local=True,
                           client=s3) as path:
        with open(os.path.join(path, "a.txt"), "w") as fh:
            fh.write("x")
    assert os.path.isfile(os.path.join(local, "a.txt"))
    with open_file_for_read(f"{remote3}/a.txt", client=s3) as fh:
        assert fh.read() == "x"
    # the reference's refusal: keeping a temp dir is meaningless
    with pytest.raises(ValueError, match="keep_local"):
        upload_on_success(remote3, keep_local=True)


def test_upload_on_success_local_destination(tmp_path):
    from smashed_spark.sources.io_utils import upload_on_success

    dest = str(tmp_path / "out")
    with upload_on_success(dest) as path:
        with open(f"{path}/r.txt", "w") as fh:
            fh.write("local")
    with open(f"{dest}/r.txt") as fh:
        assert fh.read() == "local"
