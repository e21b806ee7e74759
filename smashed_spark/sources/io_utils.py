"""Driver-side small-file I/O over local and ``s3://`` paths
(reference: src/smashed/utils/io_utils/operations.py:79-471 and
multipath.py:22-90).

Scope: *metadata-scale* driver-side files — manifests, prompt
templates, vocab files, cache markers.  DATA-scale reads/writes go
through ``spark.read`` / ``df.write``, where Hadoop's ``s3a://``
connector handles object storage distributedly; these helpers exist so
pipeline glue code (the reference's ``open_file_for_read`` /
``open_file_for_write`` / ``stream_file_for_read`` call sites) ports
over without boto plumbing.

boto3 is imported lazily and only for ``s3://`` paths, so local-only
deployments need no AWS SDK at all.
"""

from __future__ import annotations

import io
import os
import shutil
from contextlib import contextmanager
from dataclasses import dataclass
from typing import Iterator, Optional
from urllib.parse import urlparse


@dataclass(frozen=True)
class SmartPath:
    """Parsed path: ``s3://bucket/key`` or a local path (reference
    MultiPath, multipath.py:22-90 — ours keeps only scheme/bucket/key,
    the pieces the operations below need)."""

    scheme: str
    bucket: str
    key: str

    @classmethod
    def parse(cls, path: str) -> "SmartPath":
        import re

        s = str(path)
        # only URL-parse strings that actually carry a scheme: local
        # filenames may legally contain '#'/'?', which urlparse would
        # truncate into fragment/query
        if not re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://", s):
            return cls("file", "", s)
        p = urlparse(s)
        if p.scheme in ("s3", "s3a", "s3n"):
            return cls("s3", p.netloc, p.path.lstrip("/"))
        if p.scheme == "file":
            return cls("file", "", p.path)
        raise ValueError(f"unsupported scheme {p.scheme!r} in {path!r}")

    @property
    def is_s3(self) -> bool:
        return self.scheme == "s3"

    @property
    def local(self) -> str:
        assert not self.is_s3
        return self.key

    def __str__(self) -> str:
        return f"s3://{self.bucket}/{self.key}" if self.is_s3 else self.key


def _client(**boto3_kwargs):
    try:
        import boto3
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "s3:// paths need boto3 (pip install boto3); data-scale I/O "
            "should use spark.read/df.write with s3a:// instead"
        ) from e
    return boto3.client("s3", **boto3_kwargs)


@contextmanager
def open_file_for_read(path: str, mode: str = "r", client=None):
    """Read a whole file (reference operations.py:133-187).  S3 objects
    are fetched with one GET; text mode decodes utf-8."""
    sp = SmartPath.parse(path)
    if not sp.is_s3:
        with open(sp.local, mode) as f:
            yield f
        return
    client = client or _client()
    body = client.get_object(Bucket=sp.bucket, Key=sp.key)["Body"].read()
    yield io.StringIO(body.decode("utf-8")) if "b" not in mode else (
        io.BytesIO(body)
    )


@contextmanager
def stream_file_for_read(path: str, mode: str = "r", client=None):
    """Stream a file without buffering it wholly in memory (reference
    operations.py:79-130); the handle is line-iterable."""
    sp = SmartPath.parse(path)
    if not sp.is_s3:
        with open(sp.local, mode) as f:
            yield f
        return
    client = client or _client()
    raw = client.get_object(Bucket=sp.bucket, Key=sp.key)["Body"]
    # StreamingBody exposes a file-like raw stream; wrap for text
    if "b" in mode:
        yield raw
    else:
        yield io.TextIOWrapper(raw, encoding="utf-8")


@contextmanager
def open_file_for_write(path: str, mode: str = "w", client=None):
    """Write a file; s3 targets buffer locally and PUT on successful
    close (reference operations.py:251-323)."""
    sp = SmartPath.parse(path)
    if not sp.is_s3:
        parent = os.path.dirname(sp.local)
        if parent:
            os.makedirs(parent, exist_ok=True)
        with open(sp.local, mode) as f:
            yield f
        return
    buf: io.IOBase = io.BytesIO() if "b" in mode else io.StringIO()
    yield buf
    data = buf.getvalue()
    if isinstance(data, str):
        data = data.encode("utf-8")
    (client or _client()).put_object(Bucket=sp.bucket, Key=sp.key, Body=data)


def exists(path: str, client=None) -> bool:
    """reference operations.py:237-248."""
    sp = SmartPath.parse(path)
    if not sp.is_s3:
        return os.path.exists(sp.local)
    client = client or _client()
    try:
        client.head_object(Bucket=sp.bucket, Key=sp.key)
        return True
    except Exception:
        resp = client.list_objects_v2(
            Bucket=sp.bucket, Prefix=sp.key.rstrip("/") + "/", MaxKeys=1
        )
        return resp.get("KeyCount", 0) > 0


def recursively_list_files(
    path: str, client=None, ignore_hidden: bool = True
) -> Iterator[str]:
    """Yield every file under a prefix/directory (reference
    operations.py:326-395).  S3 listing is paginated — constant
    memory at any prefix size."""
    sp = SmartPath.parse(path)
    if sp.is_s3:
        client = client or _client()
        # an exact object key lists as itself (mirror of the local
        # isfile branch)
        if sp.key:
            try:
                client.head_object(Bucket=sp.bucket, Key=sp.key)
                yield str(sp)
                return
            except Exception:
                pass
        # directory semantics: anchor the prefix with '/' so sibling
        # keys sharing the name prefix ('data' vs 'data2/...') are NOT
        # swept in — remove_directory deletes whatever this yields
        prefix = sp.key.rstrip("/") + "/" if sp.key else ""
        paginator = client.get_paginator("list_objects_v2")
        for page in paginator.paginate(Bucket=sp.bucket, Prefix=prefix):
            for obj in page.get("Contents", []):
                name = obj["Key"].rsplit("/", 1)[-1]
                if ignore_hidden and name.startswith("."):
                    continue
                yield f"s3://{sp.bucket}/{obj['Key']}"
        return
    if os.path.isfile(sp.local):
        yield sp.local
        return
    for root, _dirs, files in os.walk(sp.local):
        for name in sorted(files):
            if ignore_hidden and name.startswith("."):
                continue
            yield os.path.join(root, name)


def remove_file(path: str, client=None) -> None:
    """reference operations.py:457-468."""
    sp = SmartPath.parse(path)
    if sp.is_s3:
        (client or _client()).delete_object(Bucket=sp.bucket, Key=sp.key)
    else:
        os.remove(sp.local)


def remove_directory(path: str, client=None) -> None:
    """Delete a directory / every object under a prefix (reference
    operations.py:471-491)."""
    sp = SmartPath.parse(path)
    if not sp.is_s3:
        shutil.rmtree(sp.local)
        return
    client = client or _client()
    for f in recursively_list_files(path, client, ignore_hidden=False):
        remove_file(f, client)


def copy_directory(
    src: str, dst: str, client=None, ignore_hidden: bool = True
) -> None:
    """Copy all files under ``src`` to ``dst`` across any combination
    of local and s3 (reference operations.py:398-454).  Driver-side and
    sequential by design: manifests and templates, not datasets —
    dataset copies belong to ``spark.read.../.write...`` which
    parallelizes across executors."""
    ssp, dsp = SmartPath.parse(src), SmartPath.parse(dst)
    base = ssp.key if ssp.is_s3 else ssp.local
    for f in recursively_list_files(src, client, ignore_hidden):
        fsp = SmartPath.parse(f)
        rel = (fsp.key if fsp.is_s3 else fsp.local)[len(base):].lstrip("/")
        target = (
            f"s3://{dsp.bucket}/{dsp.key.rstrip('/')}/{rel}"
            if dsp.is_s3
            else os.path.join(dsp.local, rel)
        )
        with open_file_for_read(f, "rb", client) as r:
            with open_file_for_write(target, "wb", client) as w:
                w.write(r.read())


__all__ = [
    "SmartPath",
    "open_file_for_read",
    "open_file_for_write",
    "stream_file_for_read",
    "exists",
    "recursively_list_files",
    "remove_file",
    "remove_directory",
    "copy_directory",
]
