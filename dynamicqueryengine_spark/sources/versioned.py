"""Versioned parquet tables — a minimal transaction-log table format
(the Delta/Iceberg mechanism in miniature) so keyed MERGE gets real
snapshot isolation and time travel instead of a directory swap.

Layout::

    <path>/
      _vlog/00000001.json   # manifest: {"dirs": [...], "op", "ts"}
      _vlog/00000002.json
      d_<uuid>/part-*.parquet   # immutable data directories

A TABLE VERSION is a manifest listing the immutable data directories
that make up the snapshot. Writers never modify or delete existing data
files: every commit writes NEW directories plus the next manifest.
Readers resolve the highest committed manifest (or an explicit
``version=``) and read exactly its directories — a reader holding
version N is never affected by later commits (snapshot isolation), and
any retained version can be re-read (time travel).

The commit is one ``open(manifest, "x")`` — atomic create-if-absent on
any POSIX filesystem — so two racing writers cannot both commit the
same version: the loser gets FileExistsError, re-reads the new head,
and retries (optimistic concurrency, the same loop Delta's log runs;
``vt_merge`` retries automatically because its read-merge-write is
derivable from the new head, while blind ``vt_write`` surfaces the
conflict to the caller by default).

Production deltas from this miniature: manifests would hold per-FILE
stats for data skipping, checkpoints would compact the log, and the
atomic-create primitive would come from the object store's
put-if-absent. The reader/writer contracts are the same.

``vt_vacuum`` deletes data directories unreferenced by the last
``keep_last`` manifests — the only deletion in the design, explicitly
separated from writes so readers of retained versions never race it.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from typing import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "vt_write",
    "vt_read",
    "vt_merge",
    "vt_versions",
    "vt_vacuum",
]

_DEC = "decimal(38,12)"


def _log_dir(path: str) -> str:
    return os.path.join(path, "_vlog")


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(_log_dir(path), f"{version:08d}.json")


def vt_versions(path: str) -> list[int]:
    """Committed version numbers, ascending (empty if no table)."""
    try:
        names = os.listdir(_log_dir(path))
    except FileNotFoundError:
        return []
    out = []
    for n in names:
        if n.endswith(".json"):
            try:
                out.append(int(n[:-5]))
            except ValueError:
                continue
    return sorted(out)


def _read_manifest(path: str, version: int) -> dict:
    with open(_manifest_path(path, version)) as f:
        return json.load(f)


def _commit(path: str, dirs: list[str], op: str, expected_head: int) -> int:
    """Atomically commit ``dirs`` as version ``expected_head + 1``.
    Raises FileExistsError if another writer committed first."""
    os.makedirs(_log_dir(path), exist_ok=True)
    version = expected_head + 1
    manifest = {"dirs": dirs, "op": op, "ts": time.time()}
    target = _manifest_path(path, version)
    with open(target, "x") as f:  # atomic create-if-absent = the commit
        json.dump(manifest, f)
    return version


def _write_data_dir(df: DataFrame, path: str) -> str:
    d = f"d_{uuid.uuid4().hex[:12]}"
    df.write.mode("error").parquet(os.path.join(path, d))
    return d


def vt_write(spark, path: str, df: DataFrame, mode: str = "overwrite") -> int:
    """Commit ``df`` as a new version: ``overwrite`` replaces the
    snapshot, ``append`` adds to it. Returns the committed version.
    A concurrent commit surfaces as FileExistsError — blind writes
    must not silently clobber a state they did not read."""
    head = vt_versions(path)
    expected = head[-1] if head else 0
    new_dir = _write_data_dir(df, path)
    dirs = [new_dir]
    if mode == "append" and head:
        dirs = _read_manifest(path, expected)["dirs"] + dirs
    try:
        return _commit(path, dirs, mode, expected)
    except FileExistsError:
        # lost the commit race: our data directory will never be
        # referenced — remove it now (as vt_merge does) instead of
        # leaving an orphan for a later vacuum to find
        shutil.rmtree(os.path.join(path, new_dir), ignore_errors=True)
        raise


def vt_read(spark, path: str, version: int | None = None) -> DataFrame:
    """Snapshot read: the latest committed version, or ``version=`` for
    time travel. Never sees uncommitted or later data."""
    versions = vt_versions(path)
    if not versions:
        raise FileNotFoundError(f"no committed versions at {path}")
    v = version if version is not None else versions[-1]
    if v not in versions:
        raise ValueError(f"version {v} not in {versions}")
    dirs = _read_manifest(path, v)["dirs"]
    return spark.read.parquet(*[os.path.join(path, d) for d in dirs])


def vt_merge(
    spark,
    path: str,
    updates: DataFrame,
    key_cols: Sequence[str],
    max_retries: int = 5,
) -> int:
    """Keyed MERGE as a committed version: rows in ``updates`` replace
    current rows with the same key, unmatched keys insert. Copy-on-write
    against the HEAD snapshot; on a commit race the merge re-reads the
    new head and retries (its result is derivable from any head, unlike
    a blind write). Returns the committed version."""
    keys = list(key_cols)
    for _ in range(max_retries):
        head = vt_versions(path)
        expected = head[-1] if head else 0
        if head:
            current = vt_read(spark, path, expected)
            merged = current.join(
                updates.select(*keys).distinct(), keys, "left_anti"
            ).unionByName(updates)
        else:
            merged = updates
        new_dir = _write_data_dir(merged, path)
        try:
            return _commit(path, [new_dir], "merge", expected)
        except FileExistsError:
            # another writer won this version — discard our uncommitted
            # directory and re-derive from the new head
            shutil.rmtree(os.path.join(path, new_dir), ignore_errors=True)
    raise RuntimeError(f"merge at {path} lost {max_retries} commit races")


def vt_vacuum(
    spark, path: str, keep_last: int = 2, grace_seconds: float = 600.0
) -> list[str]:
    """Delete data directories unreferenced by the last ``keep_last``
    versions (and drop the older manifests). Returns removed dirs.
    The only deletion in the design — run it only when no reader needs
    the expired versions.

    Directories referenced by SOME manifest (just an expired one) are
    committed garbage and removed unconditionally. A ``d_*`` directory
    referenced by NO manifest at all is ambiguous: it is either debris
    from a crashed writer or a CONCURRENT writer's not-yet-committed
    data — so those are only removed once older than ``grace_seconds``
    (Delta's VACUUM retention logic in miniature). ``grace_seconds=0``
    forces debris collection when no writer can be live."""
    versions = vt_versions(path)
    keep = versions[-keep_last:] if keep_last > 0 else []
    referenced: set[str] = set()
    for v in keep:
        referenced.update(_read_manifest(path, v)["dirs"])
    ever_referenced: set[str] = set(referenced)
    for v in versions:
        if v not in keep:
            ever_referenced.update(_read_manifest(path, v)["dirs"])
    now = time.time()
    removed = []
    for name in os.listdir(path):
        if not name.startswith("d_") or name in referenced:
            continue
        if name not in ever_referenced:
            # possibly an in-flight concurrent write — honor the grace
            try:
                age = now - os.path.getmtime(os.path.join(path, name))
            except OSError:
                continue  # vanished mid-scan (writer cleaned it up)
            if age < grace_seconds:
                continue
        shutil.rmtree(os.path.join(path, name), ignore_errors=True)
        removed.append(name)
    for v in versions:
        if v not in keep:
            os.remove(_manifest_path(path, v))
    return removed
