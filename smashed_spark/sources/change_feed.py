"""Incremental consumption of a governed snapshot table: a durable
cursor + ``read_snapshot_changes`` = the poll-based analog of Delta's
streaming source, for the consumers that want batch control (an
Airflow task, a cron'd index builder) rather than a Structured
Streaming query.

Beyond-reference surface (the reference — ``src/smashed/mappers`` —
has no table or changefeed notion); the protocol underneath is
sources/snapshot.py.

Semantics
---------
* The CURSOR is a tiny JSON object (local file or s3 key) recording
  the last version whose rows the consumer has fully processed.  It
  is written ATOMICALLY (same ``_write_atomic`` recipe as the table
  pointer) and only AFTER ``process`` returns — so delivery is
  AT-LEAST-ONCE: a crash between processing and the cursor write
  replays the same diff on the next poll.  Make ``process``
  idempotent (e.g. key side effects on ``new_version``, the way
  ``dedup_snapshot_batch_writer`` keys on batch id) or wrap it in
  your own transaction.
* Appends arrive as exact file-level diffs (the added rows only —
  see ``read_snapshot_changes``); the first poll bootstraps per
  ``initial=``.
* A REWRITE on the chain (compact/optimize/delete/merge/restore)
  invalidates file-level increments.  ``on_rewrite="raise"``
  (default) surfaces it loudly; ``"full_resync"`` processes the
  ENTIRE current snapshot as one catch-up batch and advances — the
  documented recovery for consumers whose processing is idempotent
  at the row level (an index rebuild, an upsert sink).  The same
  fallback covers a cursor vacuumed off the chain.
"""

from __future__ import annotations

import json
from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

from .io_utils import SmartPath
from .snapshot import (
    _read_json,
    _write_atomic,
    read_snapshot,
    read_snapshot_changes,
    resolve_snapshot,
)

__all__ = ["snapshot_change_feed", "read_feed_cursor"]


def read_feed_cursor(cursor_path: str, client=None) -> Optional[int]:
    """The last fully-consumed version the cursor records, or None
    when no poll has committed yet."""
    doc = _read_json(str(SmartPath.parse(cursor_path)), client=client)
    return None if doc is None else int(doc["version"])


def snapshot_change_feed(
    spark: SparkSession,
    table_root: str,
    cursor_path: str,
    process: Callable[[DataFrame, Optional[int], int], None],
    initial: str = "full",
    on_rewrite: str = "raise",
    where: Optional[Sequence] = None,
    client=None,
    allow_driver_download: bool = False,
) -> dict:
    """Poll once: hand ``process(df, since_version, new_version)``
    every row added since the cursor, then advance the cursor — see
    the module docstring for the delivery contract.  Returns a status
    dict: ``{"status": "noop"|"changes"|"bootstrap"|"full_resync",
    "since": ..., "version": ...}``.

    ``initial``: ``"full"`` processes the whole current snapshot on
    the first poll (``since_version=None``); ``"latest"`` skips
    existing data and starts the feed at the current version.
    ``where=`` applies the envelope file-skipping + re-filter
    contract to every delivered batch."""
    if initial not in ("full", "latest"):
        raise ValueError(
            f"snapshot_change_feed: initial={initial!r} — pass 'full' "
            "(process existing data on the first poll) or 'latest' "
            "(start the feed at the current version)"
        )
    if on_rewrite not in ("raise", "full_resync"):
        raise ValueError(
            f"snapshot_change_feed: on_rewrite={on_rewrite!r} — pass "
            "'raise' or 'full_resync'"
        )
    cpath = str(SmartPath.parse(cursor_path))
    current = resolve_snapshot(table_root, client=client)
    cursor = read_feed_cursor(cpath, client=client)

    def _full_read() -> DataFrame:
        return read_snapshot(
            spark,
            table_root,
            version=current.version,
            where=where,
            client=client,
            allow_driver_download=allow_driver_download,
        )

    def _deliver(df: Optional[DataFrame], since, status: str) -> dict:
        # the ONE delivery path every status shares: process first,
        # advance the cursor only after it returns (the at-least-once
        # contract), report what happened
        if df is not None:
            process(df, since, current.version)
        _advance(current.version)
        return {
            "status": status,
            "since": since,
            "version": current.version,
        }

    def _advance(version: int) -> None:
        _write_atomic(
            cpath, json.dumps({"version": int(version)}), client=client
        )

    if cursor is None:
        if initial == "latest":
            return _deliver(None, None, "noop")
        return _deliver(_full_read(), None, "bootstrap")
    if cursor == current.version:
        return {
            "status": "noop",
            "since": cursor,
            "version": current.version,
        }
    try:
        df = read_snapshot_changes(
            spark,
            table_root,
            since_version=cursor,
            version=current.version,
            where=where,
            client=client,
            allow_driver_download=allow_driver_download,
        )
    except (ValueError, FileNotFoundError):
        # a rewrite on the chain (file-level increments invalid) or a
        # cursor vacuumed off it
        if on_rewrite == "raise":
            raise
        return _deliver(_full_read(), cursor, "full_resync")
    return _deliver(df, cursor, "changes")
