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

import functools
import io
import os
import shutil
import tempfile
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
    def is_local(self) -> bool:
        return not self.is_s3

    @property
    def local(self) -> str:
        assert not self.is_s3
        return self.key

    def __str__(self) -> str:
        return f"s3://{self.bucket}/{self.key}" if self.is_s3 else self.key

    # -- path algebra (reference MultiPath, multipath.py:22-148: join
    # via `/`, prefix-subtract, parent/name, pathlib interop) ---------

    def __truediv__(self, other: "str | SmartPath") -> "SmartPath":
        """Append a RELATIVE segment: ``SmartPath.parse("s3://b/a") /
        "c/d.txt"``.  Joining a fully-qualified path is a bug, not a
        join — refused like the reference does."""
        o = other if isinstance(other, SmartPath) else SmartPath.parse(
            str(other)
        )
        if o.is_s3:
            raise ValueError(f"cannot join fully-qualified path {o}")
        seg = o.key.lstrip("/")
        base = (self.key.rstrip("/") + "/" + seg) if self.key else seg
        return SmartPath(self.scheme, self.bucket, base)

    @classmethod
    def join(cls, first: "str | SmartPath", *rest) -> "SmartPath":
        out = first if isinstance(first, cls) else cls.parse(str(first))
        for part in rest:
            out = out / part
        return out

    @property
    def parent(self) -> "SmartPath":
        head = self.key.rstrip("/").rsplit("/", 1)[0] if "/" in (
            self.key.rstrip("/")
        ) else ""
        return SmartPath(self.scheme, self.bucket, head)

    @property
    def name(self) -> str:
        return self.key.rstrip("/").rsplit("/", 1)[-1]

    def relative_to(self, prefix: "str | SmartPath") -> str:
        """The key remainder under ``prefix`` (same scheme+bucket
        required) — the operation the reference spells ``path - prefix``."""
        p = prefix if isinstance(prefix, SmartPath) else SmartPath.parse(
            str(prefix)
        )
        if (p.scheme, p.bucket) != (self.scheme, self.bucket):
            raise ValueError(f"{self} is not under {p}")
        pre = p.key.rstrip("/")
        # component-boundary containment: a raw startswith would call
        # 'database/x' a child of 'data' ('train' vs 'training', …)
        if pre and not (
            self.key == pre or self.key.startswith(pre + "/")
        ):
            raise ValueError(f"{self} is not under {p}")
        return self.key[len(pre):].lstrip("/") if pre else self.key

    def __sub__(self, other: "str | SmartPath") -> str:
        return self.relative_to(other)

    @property
    def as_path(self):
        """pathlib.Path for local paths (refused for s3, where no
        filesystem object exists)."""
        if self.is_s3:
            raise ValueError(f"not a local path: {self}")
        from pathlib import Path

        return Path(self.local)


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
    close (reference operations.py:251-323).

    S3 only supports whole-object truncate-writes (``w``/``wb``):
    append (``a``), exclusive-create (``x``) and update (``+``) modes
    raise instead of silently clobbering the object with truncate-PUT
    semantics that diverge from the local branch of this same helper.
    """
    sp = SmartPath.parse(path)
    if not sp.is_s3:
        parent = os.path.dirname(sp.local)
        if parent:
            os.makedirs(parent, exist_ok=True)
        with open(sp.local, mode) as f:
            yield f
        return
    unsupported = set(mode) & {"a", "x", "+", "r"}
    if unsupported:
        raise ValueError(
            f"open_file_for_write: mode {mode!r} is not supported for "
            "s3 paths (objects are immutable; a PUT would truncate-"
            "overwrite, silently diverging from local "
            f"{sorted(unsupported)} semantics) — use 'w'/'wb', or "
            "read-modify-write explicitly"
        )
    buf: io.IOBase = io.BytesIO() if "b" in mode else io.StringIO()
    yield buf
    data = buf.getvalue()
    if isinstance(data, str):
        data = data.encode("utf-8")
    (client or _client()).put_object(Bucket=sp.bucket, Key=sp.key, Body=data)


class _ZlibDecompressReader(io.RawIOBase):
    """Streaming zlib/gzip decompressor over an underlying byte stream
    (reference: src/smashed/utils/io_utils/io_wrappers.py
    BytesZLibDecompressorIO — ours is a stdlib ``zlib.decompressobj``
    incremental reader, constant memory at any object size).

    ``gzip=True`` expects a gzip header (wbits = MAX_WBITS | 16, and
    transparently restarts across concatenated gzip members, which is
    how both ``gzip`` CLI concatenation and Hadoop-written ``.gz``
    part-files behave); ``gzip=False`` expects a raw zlib stream.
    """

    def __init__(self, stream, gzip: bool = True,
                 chunk_size: int = io.DEFAULT_BUFFER_SIZE) -> None:
        import zlib

        self._zlib = zlib
        self._stream = stream
        self._chunk = chunk_size
        self._gzip = gzip
        self._wbits = (zlib.MAX_WBITS | 16) if gzip else zlib.MAX_WBITS
        self._z = zlib.decompressobj(self._wbits)
        self._eof = False

    def readable(self) -> bool:
        return True

    def readinto(self, b) -> int:
        if self._eof:
            return 0
        while True:
            if self._z.unconsumed_tail:
                # previous decompress hit max_length: drain it first
                out = self._z.decompress(
                    self._z.unconsumed_tail, len(b)
                )
            elif self._z.eof and self._gzip:
                # member finished: restart the decompressor on the
                # leftover bytes (concatenated gzip members)
                tail = self._z.unused_data
                self._z = self._zlib.decompressobj(self._wbits)
                if tail:
                    out = self._z.decompress(tail, len(b))
                else:
                    raw = self._stream.read(self._chunk)
                    if not raw:  # member ended exactly at stream end
                        self._eof = True
                        return 0
                    out = self._z.decompress(raw, len(b))
            else:
                raw = self._stream.read(self._chunk)
                if not raw:
                    out = b"" if self._z.eof else self._z.flush()
                    self._eof = True
                    b[: len(out)] = out
                    return len(out)
                out = self._z.decompress(raw, len(b))
            if out:
                b[: len(out)] = out
                return len(out)


@contextmanager
def decompress_stream(
    stream,
    mode: str = "rt",
    encoding: str = "utf-8",
    errors: str = "strict",
    chunk_size: int = io.DEFAULT_BUFFER_SIZE,
    gzip: bool = True,
):
    """Wrap an open byte stream with streaming gzip/zlib decompression
    (reference compression.py:10-40 ``decompress_stream``): ``rb``/``r``
    yield a buffered byte reader, ``rt`` a utf-8 text reader.  Compose
    with :func:`open_file_for_read`/:func:`stream_file_for_read` for
    ``.jsonl.gz`` driver-side artifacts.  Data-scale ``.gz`` stays with
    ``spark.read`` — Hadoop decodes it natively on executors."""
    if mode not in ("r", "rb", "rt"):
        raise ValueError(f"unsupported mode {mode!r}")
    raw = io.BufferedReader(
        _ZlibDecompressReader(stream, gzip=gzip, chunk_size=chunk_size),
        buffer_size=chunk_size,
    )
    out = (
        io.TextIOWrapper(raw, encoding=encoding, errors=errors)
        if mode == "rt"
        else raw
    )
    try:
        yield out
    finally:
        out.close()


@contextmanager
def compress_stream(
    stream,
    mode: str = "wt",
    encoding: str = "utf-8",
    errors: str = "strict",
    gzip: bool = True,
):
    """Wrap an open byte stream with gzip compression on write
    (reference compression.py:43-65 ``compress_stream``; like the
    reference, only gzip is supported — raw zlib writing has no
    consumer in the pipeline glue).  ``mtime=0`` pins the gzip header
    so equal content compresses to equal bytes (reproducible
    manifests)."""
    import gzip as gz

    if not gzip:
        raise ValueError("only gzip compression is supported")
    if mode not in ("w", "wb", "wt"):
        raise ValueError(f"unsupported mode {mode!r}")
    raw = gz.GzipFile(fileobj=stream, mode="wb", mtime=0)
    out = (
        io.TextIOWrapper(raw, encoding=encoding, errors=errors)
        if mode == "wt"
        else raw
    )
    try:
        yield out
    finally:
        out.close()


@contextmanager
def open_compressed(path: str, mode: str = "rt", client=None, **kw):
    """One-call gzip file access over local or s3 paths: read modes
    stream-decompress, write modes buffer-compress-PUT (s3) or write
    locally.  The ``.gz`` convenience the reference reaches via
    ``open_file_for_read(...) + decompress_stream(...)`` composition."""
    if mode in ("r", "rb", "rt"):
        with stream_file_for_read(path, "rb", client=client) as f:
            with decompress_stream(f, mode=mode, **kw) as d:
                yield d
    elif mode in ("w", "wb", "wt"):
        with open_file_for_write(path, "wb", client=client) as f:
            with compress_stream(f, mode=mode, **kw) as c:
                yield c
    else:
        raise ValueError(f"unsupported mode {mode!r}")


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


class upload_on_success:
    """Upload a local working directory to a remote destination only
    when the wrapped block exits cleanly (reference
    utils/io_utils/closures.py:15-107) — the "stage results locally,
    publish on success" closure around a training run or report job.

    Two forms, matching the reference:

    1. Context manager::

        with upload_on_success("s3://bucket/results") as path:
            ...  # write under `path`; uploaded iff no exception

    2. Decorator (the local path is PREPENDED to the call args)::

        @upload_on_success("s3://bucket/results")
        def job(path, ...):
            ...

    ``local_path=None`` (default) stages in a fresh temporary
    directory, removed at exit; an explicit ``local_path`` may be kept
    with ``keep_local=True`` (refused for the temporary default —
    there would be nothing durable to keep, reference
    closures.py:69-72).  On an exception NOTHING uploads and the
    exception propagates untouched.  Driver-side and sequential like
    :func:`copy_directory`: manifests, models, reports — not datasets
    (those belong to ``df.write``)."""

    def __init__(self, remote_path, local_path=None, keep_local=False,
                 client=None):
        if local_path is None and keep_local:
            raise ValueError(
                "upload_on_success: keep_local=True needs an explicit "
                "local_path — the default staging dir is temporary by "
                "definition"
            )
        self.remote_path = str(remote_path)
        self._tmp = None
        if local_path is None:
            self._tmp = tempfile.mkdtemp(prefix="smashed_upload_")
            local_path = self._tmp
        self.local_path = str(local_path)
        self.keep_local = keep_local
        self.client = client

    def __enter__(self) -> str:
        os.makedirs(self.local_path, exist_ok=True)
        return self.local_path

    def __exit__(self, exc_type, exc_value, traceback) -> None:
        try:
            if exc_type is None:
                copy_directory(
                    self.local_path, self.remote_path, client=self.client
                )
        finally:
            if not self.keep_local:
                shutil.rmtree(self.local_path, ignore_errors=True)
        return None  # never swallow the block's exception

    def __call__(self, func):
        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            # fresh staging per call so a decorated function is
            # re-entrant (the reference re-instantiates per call,
            # closures.py:80-89)
            with type(self)(
                self.remote_path,
                local_path=None if self._tmp is not None
                else self.local_path,
                keep_local=self.keep_local,
                client=self.client,
            ) as path:
                return func(path, *args, **kwargs)

        return wrapper


__all__ = [
    "SmartPath",
    "open_file_for_read",
    "open_file_for_write",
    "stream_file_for_read",
    "decompress_stream",
    "compress_stream",
    "open_compressed",
    "exists",
    "recursively_list_files",
    "remove_file",
    "remove_directory",
    "copy_directory",
    "upload_on_success",
]
