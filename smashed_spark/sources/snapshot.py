"""Object-store snapshot publishing: write-new-prefix + versioned
manifest + atomic pointer flip.

Beyond-reference surface (the reference — ``src/smashed/mappers/*`` —
is a single-machine library and never publishes datasets).  This module
implements the recipe the in-place rewriters refuse for object stores
(layout.py ``_local_path``: "write a NEW prefix ... then flip your
table pointer ... and delete the old prefix after"): a minimal
Iceberg/Delta-style table protocol that makes compaction, GDPR
deletions, and any other full-rewrite maintenance CRASH-SAFE where
100 TB actually lives — storage with no atomic directory rename.

Table layout under ``table_root`` (local directory or ``s3://`` prefix)::

    table_root/
      data/v00000001-<token>/...parquet   immutable, one prefix/version
      _manifests/v00000001.json           immutable, one per version
      _latest.json                        THE pointer (tiny, atomic)

Protocol invariants
-------------------
* **Data prefixes and manifests are immutable once written** — a
  publish never touches an existing version's bytes, so a reader
  holding any resolved snapshot keeps a consistent view forever (until
  an explicit :func:`vacuum_snapshots`).
* **The pointer flip is the commit.**  Locally it is ``os.replace`` of
  a same-directory temp file; on S3 it is a single ``PutObject`` —
  both atomic, so a racing reader sees the old or the new pointer,
  never a partial one, and either target is a fully-written
  manifest+prefix (the manifest is only written after the data files,
  the pointer only after the manifest).
* **Readers never list.**  ``resolve_snapshot`` is two GETs (pointer,
  manifest); the manifest carries the file list, so eventual-consistency
  of S3 LIST can never hide a fresh file from a reader.

Crash windows (writer side)
---------------------------
1. Crash during/after the data write, before the manifest: the orphan
   prefix is unreferenced and invisible (readers follow the pointer);
   :func:`vacuum_snapshots` garbage-collects it with
   ``drop_unpublished=True`` — opt-in, because a manifest-less prefix
   is also what a publish IN FLIGHT looks like.  A retried publish
   allocates a fresh random prefix token, so it can never collide with
   the orphan.
2. Crash after the manifest, before the pointer: the orphan manifest
   is OFF the pointer's parent chain and invisible to readers; version
   allocation scans manifests too, so the retry takes the NEXT number.
   Vacuum removes off-chain manifests only with
   ``drop_unpublished=True`` (default False — under the documented
   single-writer assumption an off-chain manifest is always a crash
   remnant, but the flag keeps "vacuum while a publish is in flight"
   from destroying it by default).
3. The flip itself: atomic on both tiers (see above) — no window.

Concurrency: SINGLE WRITER by assumption (like a bare-S3 Delta log).
As a belt-and-braces lost-update check, the publisher re-reads the
pointer immediately before flipping and refuses if it moved since the
publish began; this detects, not prevents, a second writer (plain S3
has no compare-and-swap to build a real lock on).

Scale notes
-----------
* The data write IS a normal Spark write.  On a real cluster with
  hadoop-aws on the classpath, executors write straight to the new
  ``s3a://`` prefix (zero driver bytes).  THIS sandbox has no s3
  Hadoop connector, so the s3 tier stages the Spark write in a local
  temp dir and uploads via io_utils — driver-side and sequential,
  fine for the moto tests that certify the PROTOCOL, wrong for bulk
  data; the seam is :func:`_write_data_prefix`, and the manifest/
  pointer machinery above it is byte-identical either way.
* Manifests list every file with its size: for a 100 TB / 128 MB-file
  table that is ~800k entries, a few tens of MB of JSON — one object,
  written once, read once per job.  (Iceberg splits manifests for
  million-file tables; this protocol accepts the single-object ceiling
  and says so.)
* :func:`compact_snapshot` reuses layout.py's ``packed_scan_conf`` so
  the compaction rewrite is still a ZERO-exchange scan→write, now
  landing in a new prefix instead of an in-place swap.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
import uuid
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import io_utils
from .io_utils import SmartPath
from .layout import packed_scan_conf

MANIFEST_DIR = "_manifests"
POINTER_NAME = "_latest.json"
DATA_DIR = "data"

# forget lists are usually thousands to low millions of keys; above
# this the broadcast would strain executors and a shuffled anti-join
# is the honest plan (same threshold as sources/retention.py)
DEFAULT_BROADCAST_KEYS = 2_000_000


@dataclass(frozen=True)
class SnapshotInfo:
    """A resolved snapshot: everything a reader needs, no listing."""

    version: int
    data_prefix: str  # fully-qualified (local path or s3://...)
    files: List[Dict[str, object]]  # [{"path": rel, "bytes": int}, ...]
    row_count: int
    parent: Optional[int]
    operation: str
    committed_at: float
    # free-form operation metadata carried by the manifest (e.g. the
    # fitted Z-order bounds an optimize publish must hand the next one)
    properties: Dict[str, object]

    @property
    def file_paths(self) -> List[str]:
        base = self.data_prefix.rstrip("/")
        return [f"{base}/{f['path']}" for f in self.files]


def _manifest_key(version: int) -> str:
    return f"{MANIFEST_DIR}/v{version:08d}.json"


def _pointer_path(root: SmartPath) -> str:
    return str(root / POINTER_NAME)


def _write_atomic(path: str, payload: str, client=None) -> None:
    """Atomic whole-object write on both tiers: same-directory temp +
    ``os.replace`` locally; a single PUT on s3 (atomic object replace
    in S3's model — readers see the old or the new body, never a mix).
    """
    sp = SmartPath.parse(path)
    if sp.is_s3:
        with io_utils.open_file_for_write(path, "w", client=client) as f:
            f.write(payload)
        return
    parent = os.path.dirname(sp.local)
    if parent:
        os.makedirs(parent, exist_ok=True)
    tmp = os.path.join(
        parent or ".", f".{os.path.basename(sp.local)}.{uuid.uuid4().hex}"
    )
    with open(tmp, "w") as f:
        f.write(payload)
    os.replace(tmp, sp.local)


def _read_json(path: str, client=None) -> Optional[dict]:
    if not io_utils.exists(path, client=client):
        return None
    with io_utils.open_file_for_read(path, "r", client=client) as f:
        return json.load(f)


def _pointer_version(root: SmartPath, client=None) -> Optional[int]:
    doc = _read_json(_pointer_path(root), client=client)
    return None if doc is None else int(doc["version"])


def list_snapshots(table_root: str, client=None) -> List[int]:
    """Versions with a manifest present, ascending.  Listing is a
    WRITER/maintenance concern (allocation, vacuum) — readers resolve
    through the pointer and never call this."""
    root = SmartPath.parse(table_root)
    out = []
    for f in io_utils.recursively_list_files(
        str(root / MANIFEST_DIR), client=client
    ):
        name = f.rsplit("/", 1)[-1]
        if name.startswith("v") and name.endswith(".json"):
            try:
                out.append(int(name[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def resolve_snapshot(
    table_root: str, version: Optional[int] = None, client=None
) -> SnapshotInfo:
    """Resolve the current (or an explicit ``version``) snapshot: two
    GETs, no listing.  Raises if the table has no published snapshot or
    the requested version's manifest is absent (vacuumed or never
    committed)."""
    root = SmartPath.parse(table_root)
    if version is None:
        version = _pointer_version(root, client=client)
        if version is None:
            raise FileNotFoundError(
                f"resolve_snapshot: no pointer at {_pointer_path(root)!r} "
                "— nothing has been published to this table root"
            )
    manifest = _read_json(str(root / _manifest_key(version)), client=client)
    if manifest is None:
        raise FileNotFoundError(
            f"resolve_snapshot: no manifest for version {version} under "
            f"{table_root!r} (vacuumed, or a publish that never committed)"
        )
    return SnapshotInfo(
        version=int(manifest["version"]),
        data_prefix=str(root / manifest["data_prefix"]),
        files=list(manifest["files"]),
        row_count=int(manifest["row_count"]),
        parent=manifest.get("parent"),
        operation=str(manifest.get("operation", "publish")),
        committed_at=float(manifest.get("committed_at", 0.0)),
        properties=dict(manifest.get("properties") or {}),
    )


def _next_version(root: SmartPath, client=None) -> int:
    """1 + max(published pointer, any manifest on disk) — an orphan
    manifest from a crashed publish (window 2) must not be reused."""
    versions = list_snapshots(str(root), client=client)
    ptr = _pointer_version(root, client=client)
    ceiling = max([ptr or 0] + versions)
    return ceiling + 1


def _local_parquet_files(local_dir: str) -> List[str]:
    out = []
    for cur, dirs, names in os.walk(local_dir):
        dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
        for n in names:
            if n.endswith(".parquet"):
                out.append(os.path.join(cur, n))
    return sorted(out)


def _write_data_prefix(
    df: DataFrame,
    root: SmartPath,
    rel_prefix: str,
    compression: str,
    client=None,
) -> Dict[str, object]:
    """Write ``df`` as parquet under ``root/rel_prefix`` and return the
    manifest's file inventory (relative paths + sizes) and footer row
    count.

    Local tier: a direct Spark write.  S3 tier: the Spark write lands
    in a local staging dir and io_utils uploads it — the sandbox has no
    s3 Hadoop connector; on a real cluster pass an ``s3a://`` root
    straight to Spark instead and executors write the prefix directly
    (the manifest/pointer protocol above this seam is identical).
    """
    import pyarrow.parquet as pq

    if root.is_s3:
        staging_root = tempfile.mkdtemp(prefix="smashed_snap_")
        # mkdtemp creates the dir, which errorifexists would refuse —
        # Spark writes a fresh child instead
        staging = os.path.join(staging_root, "data")
        try:
            (
                df.write.mode("errorifexists")
                .option("compression", compression)
                .parquet(staging)
            )
            if not os.path.isfile(os.path.join(staging, "_SUCCESS")):
                raise RuntimeError(
                    "publish_snapshot: staging write finished without "
                    "_SUCCESS; refusing to publish"
                )
            files = _local_parquet_files(staging)
            inventory, rows = [], 0
            for f in files:
                rel = os.path.relpath(f, staging)
                inventory.append(
                    {"path": rel, "bytes": os.path.getsize(f)}
                )
                rows += pq.ParquetFile(f).metadata.num_rows
                dest = str(root / rel_prefix / rel)
                with open(f, "rb") as r:
                    with io_utils.open_file_for_write(
                        dest, "wb", client=client
                    ) as w:
                        w.write(r.read())
            return {"files": inventory, "row_count": rows}
        finally:
            shutil.rmtree(staging_root, ignore_errors=True)

    dest = str(root / rel_prefix)
    (
        df.write.mode("errorifexists")
        .option("compression", compression)
        .parquet(dest)
    )
    if not os.path.isfile(os.path.join(dest, "_SUCCESS")):
        raise RuntimeError(
            "publish_snapshot: data write finished without _SUCCESS; "
            "refusing to publish"
        )
    inventory, rows = [], 0
    for f in _local_parquet_files(dest):
        rel = os.path.relpath(f, dest)
        inventory.append({"path": rel, "bytes": os.path.getsize(f)})
        rows += pq.ParquetFile(f).metadata.num_rows
    return {"files": inventory, "row_count": rows}


def publish_snapshot(
    df: DataFrame,
    table_root: str,
    operation: str = "publish",
    compression: str = "zstd",
    properties: Optional[Dict[str, object]] = None,
    client=None,
) -> SnapshotInfo:
    """Publish ``df`` as the table's next snapshot (see module docstring
    for the protocol and its crash windows).  Returns the committed
    :class:`SnapshotInfo`.

    Order of operations IS the crash-safety argument: data prefix
    (new, random-token suffix) → manifest (immutable, versioned) →
    pointer (atomic flip).  A failure anywhere leaves the previous
    snapshot fully readable and the debris invisible + vacuumable.
    """
    root = SmartPath.parse(table_root)
    begin_version = _pointer_version(root, client=client)
    version = _next_version(root, client=client)
    token = uuid.uuid4().hex[:8]
    rel_prefix = f"{DATA_DIR}/v{version:08d}-{token}"

    written = _write_data_prefix(
        df, root, rel_prefix, compression, client=client
    )

    manifest = {
        "version": version,
        "data_prefix": rel_prefix,
        "files": written["files"],
        "row_count": written["row_count"],
        "parent": begin_version,
        "operation": operation,
        "committed_at": time.time(),
        "format": "parquet",
        "properties": dict(properties or {}),
    }
    # manifests are immutable: if OUR allocated version already has one,
    # a second writer claimed it while we were writing data — refuse
    # rather than clobber their (possibly already-published) manifest.
    # Detection, not prevention: the exists→write pair is not atomic on
    # plain S3, but it converts the silent-overwrite failure mode into a
    # loud one in every race this side of a same-millisecond photo
    # finish.
    manifest_path = str(root / _manifest_key(version))
    if io_utils.exists(manifest_path, client=client):
        raise RuntimeError(
            f"publish_snapshot: manifest for v{version} already exists — "
            "concurrent writer detected; this table requires a single "
            "writer.  Our data prefix is an orphan (vacuum will sweep it)."
        )
    _write_atomic(manifest_path, json.dumps(manifest, indent=1), client=client)

    # lost-update check (detection, not prevention — single writer by
    # contract): if someone else flipped the pointer while we wrote,
    # flipping now would silently discard their snapshot from the chain
    current = _pointer_version(root, client=client)
    if current != begin_version:
        raise RuntimeError(
            f"publish_snapshot: pointer moved {begin_version} -> "
            f"{current} during publish of v{version} — concurrent "
            "writer detected; this table requires a single writer. "
            f"The prepared manifest {_manifest_key(version)!r} was NOT "
            "published (vacuum with drop_unpublished=True to discard, "
            "or re-publish)."
        )
    _write_atomic(
        _pointer_path(root),
        json.dumps({"version": version, "manifest": _manifest_key(version)}),
        client=client,
    )
    return resolve_snapshot(table_root, version, client=client)


def read_snapshot(
    spark: SparkSession,
    table_root: str,
    version: Optional[int] = None,
    client=None,
    allow_driver_download: bool = False,
) -> DataFrame:
    """Scan a snapshot.  The resolved file list (not the prefix) is
    passed to the reader, so debris from a crashed write inside the
    prefix could never leak into the scan, and `_SUCCESS`/hidden files
    are excluded by construction.

    S3 tier: this sandbox has no s3 Hadoop connector, so Spark cannot
    scan ``s3://`` directly here — on a real cluster the same resolved
    paths scan as ``s3a://`` URIs.  ``allow_driver_download=True``
    copies the snapshot to a local temp dir through io_utils first
    (driver-side: tests and small tables only, and it says so)."""
    info = resolve_snapshot(table_root, version, client=client)
    root = SmartPath.parse(table_root)
    if root.is_s3:
        if not allow_driver_download:
            raise NotImplementedError(
                "read_snapshot: Spark in this environment has no s3 "
                "Hadoop connector (hadoop-aws/s3a is not on the "
                "classpath), so the resolved s3:// files cannot be "
                "scanned directly.  On a real cluster read "
                "SnapshotInfo.file_paths as s3a:// URIs; for tests and "
                "small tables pass allow_driver_download=True."
            )
        local_dir = tempfile.mkdtemp(prefix="smashed_snapread_")
        # the returned DataFrame reads these files LAZILY, so the dir
        # cannot be removed here; reclaim it at interpreter exit so a
        # maintenance loop over many tables doesn't fill TMPDIR
        import atexit

        atexit.register(shutil.rmtree, local_dir, ignore_errors=True)
        for f in info.file_paths:
            rel = SmartPath.parse(f).relative_to(
                SmartPath.parse(info.data_prefix)
            )
            dest = os.path.join(local_dir, rel)
            os.makedirs(os.path.dirname(dest) or local_dir, exist_ok=True)
            with io_utils.open_file_for_read(f, "rb", client=client) as r:
                with open(dest, "wb") as w:
                    w.write(r.read())
        return spark.read.parquet(
            *[os.path.join(local_dir, x["path"]) for x in info.files]
        )
    return spark.read.parquet(*info.file_paths)


def _remove_dir_quiet(path: str, client=None) -> None:
    """remove_directory tolerating an already-missing target — what
    makes an interrupted vacuum re-runnable (s3 deletes are naturally
    idempotent; local shutil.rmtree is not)."""
    try:
        io_utils.remove_directory(path, client=client)
    except FileNotFoundError:
        pass


def vacuum_snapshots(
    table_root: str,
    keep_last: int = 2,
    drop_unpublished: bool = False,
    client=None,
) -> Dict[str, object]:
    """Garbage-collect what the pointer can no longer reach.

    "Published" means ON THE POINTER'S ANCESTRY CHAIN (current →
    parent → ...), not numerically below the pointer: a manifest from
    a publish that crashed before its flip (window 2) sits off-chain
    forever, whatever versions commit after it.  Removes (a) chain
    members older than the newest ``keep_last`` unconditionally, and
    (b) — only with ``drop_unpublished=True`` — everything
    unreferenced: off-chain manifests+prefixes (window 2 debris) AND
    manifest-less data prefixes (window 1 debris).  Both opt-in for
    the same reason: from the outside, crash debris is
    indistinguishable from a publish IN FLIGHT (a half-uploaded data
    prefix has no manifest yet either; sweeping it by default would
    let a routine vacuum destroy the upload and the publisher would
    then commit a manifest pointing at deleted objects).
    ``drop_unpublished=True`` is the caller's assertion that no
    publish is running.

    The CURRENT snapshot is never removed, whatever ``keep_last`` says.
    Idempotent under interruption: removals tolerate already-missing
    targets, and a half-removed version is simply re-removed next run.
    """
    if keep_last < 1:
        raise ValueError("vacuum_snapshots: keep_last must be >= 1")
    root = SmartPath.parse(table_root)
    current = _pointer_version(root, client=client)
    if current is None:
        raise FileNotFoundError(
            f"vacuum_snapshots: no pointer under {table_root!r}"
        )
    versions = list_snapshots(table_root, client=client)
    manifests = {
        v: _read_json(str(root / _manifest_key(v)), client=client)
        for v in versions
    }
    chain: List[int] = []
    cursor: Optional[int] = current
    while cursor is not None and cursor in manifests:
        chain.append(cursor)
        parent = manifests[cursor].get("parent")
        cursor = int(parent) if parent is not None else None
    chain.reverse()  # oldest first
    keep = set(chain[-keep_last:])
    keep.add(current)

    dropped_versions: List[int] = []
    referenced_rel: set = set()
    for v in versions:
        doc = manifests[v]
        if doc is None:  # raced its own removal; nothing to do
            continue
        rel = str(doc["data_prefix"])
        on_chain = v in chain
        drop = (on_chain and v not in keep) or (
            not on_chain and drop_unpublished
        )
        if drop:
            _remove_dir_quiet(str(root / rel), client=client)
            io_utils.remove_file(
                str(root / _manifest_key(v)), client=client
            )
            dropped_versions.append(v)
        else:
            referenced_rel.add(rel)

    # unreferenced data prefixes: crash window 1 (no manifest was ever
    # written) — but also exactly what an IN-FLIGHT publish looks like
    # before its manifest lands, so sweeping requires the same
    # no-publish-running assertion as off-chain manifests.  Listing
    # data/ finds each orphan's files; their first-level directory
    # name is the prefix to sweep.
    dropped_orphans: List[str] = []
    if drop_unpublished:
        seen_prefixes: set = set()
        for f in io_utils.recursively_list_files(
            str(root / DATA_DIR), client=client, ignore_hidden=False
        ):
            rel = SmartPath.parse(f).relative_to(root / DATA_DIR)
            top = rel.split("/", 1)[0]
            seen_prefixes.add(f"{DATA_DIR}/{top}")
        for prefix in sorted(seen_prefixes - referenced_rel):
            _remove_dir_quiet(str(root / prefix), client=client)
            dropped_orphans.append(prefix)

    return {
        "current": current,
        "kept": sorted(keep),
        "dropped_versions": sorted(dropped_versions),
        "dropped_orphan_prefixes": dropped_orphans,
    }


# ---------------------------------------------------------------------------
# Maintenance composed onto the protocol: compaction + GDPR deletions
# as snapshot publishes (never in-place) — the object-store answer to
# layout.compact_dataset / retention.apply_deletions.
# ---------------------------------------------------------------------------


def compact_snapshot(
    spark: SparkSession,
    table_root: str,
    target_file_bytes: int = 128 << 20,
    compression: str = "zstd",
    sort_within: Sequence[str] = (),
    client=None,
    allow_driver_download: bool = False,
) -> SnapshotInfo:
    """Publish a compacted copy of the current snapshot as the next
    version.  Same ZERO-exchange plan as ``compact_dataset`` (the scan
    bin-packs via ``packed_scan_conf``; each task writes one
    target-sized file) but the output lands in a NEW prefix and commits
    via the pointer — crash-safe on storage with no atomic rename.
    Old files stay readable until :func:`vacuum_snapshots`."""
    with packed_scan_conf(spark, target_file_bytes):
        df = read_snapshot(
            spark,
            table_root,
            client=client,
            allow_driver_download=allow_driver_download,
        )
        if sort_within:
            df = df.sortWithinPartitions(*sort_within)
        return publish_snapshot(
            df,
            table_root,
            operation="compact",
            compression=compression,
            client=client,
        )


def optimize_snapshot(
    spark: SparkSession,
    table_root: str,
    cluster_by: Sequence[str],
    bits: int = 16,
    bounds=None,
    num_files: Optional[int] = None,
    keep_zorder_column: bool = False,
    compression: str = "zstd",
    client=None,
    allow_driver_download: bool = False,
) -> SnapshotInfo:
    """Publish a Z-order-clustered copy of the current snapshot as the
    next version — ``optimize_layout`` recast onto the snapshot
    protocol (same exact-arithmetic Morton key via ``zorder_column``,
    same ONE ``repartitionByRange`` exchange; the write lands in a NEW
    prefix and commits via the pointer).  The fitted bounds are
    PERSISTED in the manifest (``SnapshotInfo.properties
    ["zorder_bounds"]``, with ``zorder_bits``/``cluster_by``), so the
    next optimize can keep Z-keys append-stable by passing them back
    as ``bounds=`` — no side-channel caller persistence needed.

    No ``partition_transforms`` tier here BY DESIGN: snapshot readers
    scan the manifest's explicit file list, and Spark does not infer
    hive partition columns from explicit file paths — a partitioned
    prefix would silently lose those columns on read.  Directory-level
    pruning belongs to ``optimize_layout`` datasets; snapshots prune at
    the file/row-group tier, which the Z-order write is for."""
    from .layout import ZORDER_FIELD, fit_zorder_bounds, zorder_column

    df = read_snapshot(
        spark,
        table_root,
        client=client,
        allow_driver_download=allow_driver_download,
    )
    cluster_by = list(cluster_by)
    if ZORDER_FIELD in df.columns:
        raise ValueError(
            f"optimize_snapshot: snapshot already has a {ZORDER_FIELD!r} "
            "column (a previous keep_zorder_column=True publish?) — "
            "drop it first; silently overwriting a data column is how "
            "columns get lost"
        )
    if bounds is None:
        bounds = fit_zorder_bounds(df, cluster_by)
    out = df.withColumn(
        ZORDER_FIELD, zorder_column(df, cluster_by, bounds, bits)
    )
    if num_files is None:
        num_files = spark.sparkContext.defaultParallelism
    out = out.repartitionByRange(
        num_files, ZORDER_FIELD
    ).sortWithinPartitions(ZORDER_FIELD)
    if not keep_zorder_column:
        out = out.drop(ZORDER_FIELD)
    return publish_snapshot(
        out,
        table_root,
        operation="optimize",
        compression=compression,
        properties={
            "zorder_bounds": {c: list(bounds[c]) for c in cluster_by},
            "zorder_bits": int(bits),
            "cluster_by": cluster_by,
        },
        client=client,
    )


def apply_deletions_snapshot(
    spark: SparkSession,
    table_root: str,
    keys: Union[DataFrame, Sequence],
    key_field: str,
    broadcast_threshold_rows: int = DEFAULT_BROADCAST_KEYS,
    compression: str = "zstd",
    client=None,
    allow_driver_download: bool = False,
) -> SnapshotInfo:
    """Publish a copy of the current snapshot without any row whose
    ``key_field`` appears in ``keys`` — the GDPR/forget-list rewrite as
    a snapshot publish (the object-store analog of
    ``retention.apply_deletions``).

    Strategy mirrors retention.py: a bounded
    ``limit(threshold+1).count()`` probe decides broadcast vs plain
    LEFT ANTI join.  NULL forget keys raise — NULL never equals
    anything in a join, so a NULL "deletion" would silently delete
    nothing."""
    df = read_snapshot(
        spark,
        table_root,
        client=client,
        allow_driver_download=allow_driver_download,
    )
    if key_field not in df.columns:
        raise ValueError(
            f"apply_deletions_snapshot: key_field {key_field!r} not in "
            f"snapshot columns {df.columns}"
        )
    if isinstance(keys, DataFrame):
        if key_field not in keys.columns:
            raise ValueError(
                f"apply_deletions_snapshot: key_field {key_field!r} not "
                f"in keys columns {keys.columns}"
            )
        key_df = keys.select(key_field)
    else:
        seq = list(keys)
        if not seq:
            raise ValueError(
                "apply_deletions_snapshot: empty forget list — refusing "
                "a no-op publish (pass a non-empty key set)"
            )
        key_df = df.sparkSession.createDataFrame(
            [(k,) for k in seq], schema=df.select(key_field).schema
        )
    if key_df.filter(F.col(key_field).isNull()).limit(1).count() > 0:
        raise ValueError(
            "apply_deletions_snapshot: NULL forget key — NULL never "
            "joins, so it would silently delete nothing"
        )
    probed = key_df.limit(broadcast_threshold_rows + 1).count()
    anti = (
        F.broadcast(key_df) if probed <= broadcast_threshold_rows else key_df
    )
    survivors = df.join(anti, on=key_field, how="left_anti")
    return publish_snapshot(
        survivors,
        table_root,
        operation="delete",
        compression=compression,
        client=client,
    )


__all__ = [
    "SnapshotInfo",
    "publish_snapshot",
    "read_snapshot",
    "resolve_snapshot",
    "list_snapshots",
    "vacuum_snapshots",
    "compact_snapshot",
    "optimize_snapshot",
    "apply_deletions_snapshot",
]
