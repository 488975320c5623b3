"""Versioned parquet tables: a minimal transaction log giving snapshot
isolation, time travel, and atomic commits on plain parquet.

Delta/Iceberg jars are not in this image (NOTES.md), and the dynamic
partition-overwrite discipline used elsewhere (plans/merge.py,
streaming/pipeline.upsert_silver_sink) gives idempotence but not
versioned reads: once a partition is overwritten, the previous state is
gone. This module supplies the missing lakehouse semantics the same way
the real table formats do — an append-only manifest log over immutable
data files:

```
table_dir/
  data/<commit-uuid>/part-*.parquet   immutable, never rewritten
  _versions/v%010d.json               manifest: the file list of version N
  _latest                             tiny pointer file, swapped atomically
```

Commit protocol (single writer, any number of readers):

1. write the new data files under ``data/<uuid>/`` — invisible to every
   reader because no manifest references them yet;
2. write the immutable manifest ``_versions/vN.json`` (the version's
   COMPLETE file list: for ``append`` mode, previous files + new ones;
   for ``overwrite``, just the new ones);
3. atomically swap the ``_latest`` pointer (write-temp + rename on a
   filesystem; on an object store swap this step for a conditional put).

A reader resolves a version to its manifest once and then reads a FIXED
file list — concurrent commits cannot change, truncate, or duplicate
what it sees (snapshot isolation); a crash between steps leaves at worst
orphaned data files, never a corrupt table. ``vacuum`` deletes files no
live manifest references.

At 100 TB the costs hold: a commit writes its own data plus one manifest
(file list of the touched scope — keep tables partitioned and commit per
partition scope to bound manifest size); time travel is manifest lookup,
not data copy; rollback writes one manifest and zero data bytes.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "commit_version",
    "read_version",
    "latest_version",
    "history",
    "rollback",
    "vacuum",
    "merge_commit",
]

_VERSIONS = "_versions"
_LATEST = "_latest"


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, _VERSIONS, f"v{version:010d}.json")


def _read_manifest(table_dir: str, version: int) -> dict:
    with open(_manifest_path(table_dir, version)) as f:
        return json.load(f)


def latest_version(table_dir: str) -> int | None:
    """Current table version via the pointer file; None for an empty or
    uninitialized table."""
    try:
        with open(os.path.join(table_dir, _LATEST)) as f:
            return int(f.read().strip())
    except (FileNotFoundError, ValueError):
        return None


def _swap_latest(table_dir: str, version: int) -> None:
    tmp = os.path.join(table_dir, f"{_LATEST}.tmp.{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, os.path.join(table_dir, _LATEST))  # atomic on posix


def commit_version(
    df: DataFrame,
    table_dir: str,
    mode: str = "overwrite",
    note: str = "",
) -> int:
    """Commit ``df`` as a new table version and return its number.

    ``overwrite``: the new version contains exactly ``df``.
    ``append``: the new version contains the previous version's files
    (untouched — appends never rewrite data) plus ``df``'s.
    """
    if mode not in ("overwrite", "append"):
        raise ValueError(mode)
    os.makedirs(os.path.join(table_dir, _VERSIONS), exist_ok=True)
    commit_id = uuid.uuid4().hex
    data_dir = os.path.join(table_dir, "data", commit_id)
    df.write.parquet(data_dir)
    new_files = sorted(
        os.path.join(data_dir, f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    )
    prev = latest_version(table_dir)
    files = list(new_files)
    if mode == "append" and prev is not None:
        files = _read_manifest(table_dir, prev)["files"] + files
    version = (prev or 0) + 1
    manifest = {
        "version": version,
        "mode": mode,
        "note": note,
        "committed_at": time.time(),
        "files": files,
    }
    with open(_manifest_path(table_dir, version), "w") as f:
        json.dump(manifest, f)
    _swap_latest(table_dir, version)
    return version


def read_version(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Snapshot read: the exact file list of ``version`` (default:
    latest). The returned frame is pinned — later commits, rollbacks, or
    vacuums of OTHER versions never change what it reads."""
    if version is None:
        version = latest_version(table_dir)
        if version is None:
            raise FileNotFoundError(f"no committed version in {table_dir}")
    files = _read_manifest(table_dir, version)["files"]
    if not files:
        raise FileNotFoundError(f"version {version} has no files")
    return spark.read.parquet(*files)


def history(table_dir: str) -> list[dict]:
    """All committed manifests, oldest first, without file lists."""
    vdir = os.path.join(table_dir, _VERSIONS)
    out = []
    for name in sorted(os.listdir(vdir)):
        with open(os.path.join(vdir, name)) as f:
            m = json.load(f)
        out.append(
            {k: m[k] for k in ("version", "mode", "note", "committed_at")}
            | {"n_files": len(m["files"])}
        )
    return out


def rollback(table_dir: str, version: int) -> int:
    """Restore an old snapshot as the NEW latest version (zero data
    bytes written — the new manifest references the old files)."""
    old = _read_manifest(table_dir, version)
    cur = latest_version(table_dir)
    assert cur is not None
    new_version = cur + 1
    manifest = {
        "version": new_version,
        "mode": "rollback",
        "note": f"rollback to v{version}",
        "committed_at": time.time(),
        "files": old["files"],
    }
    with open(_manifest_path(table_dir, new_version), "w") as f:
        json.dump(manifest, f)
    _swap_latest(table_dir, new_version)
    return new_version


def vacuum(table_dir: str, keep_versions: int = 1) -> list[str]:
    """Delete data files referenced by NO retained manifest (the newest
    ``keep_versions`` manifests are retained, plus any the current
    ``_latest`` points at). Returns the deleted paths. Run only when no
    reader can still hold a pinned frame on an expired version."""
    cur = latest_version(table_dir)
    vdir = os.path.join(table_dir, _VERSIONS)
    versions = sorted(
        int(n[1:-5]) for n in os.listdir(vdir) if n.endswith(".json")
    )
    keep = set(versions[-keep_versions:])
    if cur is not None:
        keep.add(cur)
    live: set[str] = set()
    for v in keep:
        live.update(_read_manifest(table_dir, v)["files"])
    deleted = []
    data_root = os.path.join(table_dir, "data")
    for commit_id in os.listdir(data_root):
        cdir = os.path.join(data_root, commit_id)
        for f in os.listdir(cdir):
            p = os.path.join(cdir, f)
            if f.endswith(".parquet") and p not in live:
                os.remove(p)
                deleted.append(p)
        if not os.listdir(cdir):
            os.rmdir(cdir)
    for v in versions:
        if v not in keep:
            os.remove(_manifest_path(table_dir, v))
    return deleted


def merge_commit(
    spark: SparkSession,
    updates: DataFrame,
    table_dir: str,
    keys: list[str],
    order_col: str | None = None,
    note: str = "merge",
) -> int:
    """MERGE as a version commit: upsert ``updates`` into the latest
    snapshot and commit the result as a new version — the composition of
    plans/merge.py's row-level contract with the manifest log, giving an
    upsert you can time-travel across and roll back (what `MERGE INTO` +
    table history provides on a real lakehouse format).

    Matched keys take the update row (last-wins on ``order_col`` within
    the batch); unmatched keys append. The previous snapshot's files are
    untouched — readers pinned on old versions are unaffected.

    Note the cost model difference vs merge_into_parquet: this rewrites
    the whole CURRENT snapshot into the new version (simple, version-
    complete), where merge_into_parquet rewrites only touched partitions
    (cheaper, but no history). At 100 TB use this for dimension-sized
    tables (the SCD2/security-master class) and the partition-scoped
    MERGE for the fact tables.
    """
    from pyspark.sql import functions as F

    from ..operators.dedup import dedup_by_key

    if order_col is not None:
        updates = dedup_by_key(updates, keys, [order_col], keep="last").drop(
            order_col
        )
    prev = latest_version(table_dir)
    if prev is None:
        return commit_version(updates, table_dir, note=note)
    current = read_version(spark, table_dir, prev)
    kept = current.join(
        F.broadcast(updates.select(*keys).distinct()), keys, "left_anti"
    )
    return commit_version(
        kept.unionByName(updates), table_dir, mode="overwrite", note=note
    )
