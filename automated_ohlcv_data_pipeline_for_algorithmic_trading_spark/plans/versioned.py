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

Filesystem routing: data files go through ``df.write.parquet`` (Hadoop
FS) in all cases; manifest/pointer/listing I/O goes through the SAME
Hadoop FileSystem API (resolved from the table path + active session's
Hadoop conf) whenever the table lives on a non-local filesystem, so the
commit protocol works on HDFS/object stores in cluster mode, not just on
one node. Local paths use a plain-``os`` fast path whose pointer swap is
an atomic ``rename(2)``. CAVEATS on shared storage: the pointer swap is
delete+rename (atomic on HDFS renames, NOT on S3 — use a conditional-put
pointer there), and the protocol is single-writer by design everywhere.

At 100 TB the costs hold: a commit writes its own data plus one manifest
(file list of the touched scope — keep tables partitioned and commit per
partition scope to bound manifest size); time travel is manifest lookup,
not data copy; rollback writes one manifest and zero data bytes.
"""

from __future__ import annotations

import json
import os
import posixpath
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


def _is_local(path: str) -> bool:
    scheme = path.split("://", 1)[0] if "://" in path else ""
    return scheme in ("", "file")


class _LocalIO:
    """Plain-os metadata I/O for local tables (the test/bench path).
    Pointer swap is rename(2) — atomic on posix."""

    def join(self, *parts: str) -> str:
        return os.path.join(*parts)

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def write_text(self, path: str, text: str) -> None:
        with open(path, "w") as f:
            f.write(text)

    def swap_pointer(self, tmp: str, dest: str) -> None:
        os.replace(tmp, dest)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)

    def remove(self, path: str) -> None:
        os.remove(path)

    def rmdir_if_empty(self, path: str) -> None:
        if not os.listdir(path):
            os.rmdir(path)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)


class _HadoopIO:
    """Metadata I/O through the Hadoop FileSystem API (py4j), resolved
    from the table path against the active session's Hadoop conf — the
    route that makes commits work on HDFS/object stores in cluster mode.
    Manifests are small (one JSON per commit), so the per-call py4j
    overhead is irrelevant next to the data write."""

    def __init__(self, root: str):
        spark = SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError(
                f"versioned table at non-local path {root!r} requires an "
                f"active SparkSession to reach its Hadoop FileSystem"
            )
        self._jvm = spark._jvm
        self._jpath = self._jvm.org.apache.hadoop.fs.Path
        self._fs = self._jpath(root).getFileSystem(
            spark._jsc.hadoopConfiguration()
        )

    def join(self, *parts: str) -> str:
        return posixpath.join(*parts)

    def read_text(self, path: str) -> str:
        stream = self._fs.open(self._jpath(path))
        try:
            out = self._jvm.java.io.ByteArrayOutputStream()
            self._jvm.org.apache.hadoop.io.IOUtils.copyBytes(
                stream, out, 4096, False
            )
            return bytes(out.toByteArray()).decode("utf-8")
        finally:
            stream.close()

    def write_text(self, path: str, text: str) -> None:
        stream = self._fs.create(self._jpath(path), True)
        try:
            stream.write(bytearray(text.encode("utf-8")))
        finally:
            stream.close()

    def swap_pointer(self, tmp: str, dest: str) -> None:
        # delete+rename: atomic enough on HDFS (rename is atomic; the
        # delete→rename window can only make the pointer briefly absent,
        # which readers treat as "uninitialized", never corrupt). On S3
        # replace this with a conditional put.
        d = self._jpath(dest)
        if self._fs.exists(d):
            self._fs.delete(d, False)
        if not self._fs.rename(self._jpath(tmp), d):
            raise OSError(f"pointer swap failed: {tmp} -> {dest}")

    def makedirs(self, path: str) -> None:
        self._fs.mkdirs(self._jpath(path))

    def listdir(self, path: str) -> list[str]:
        return [
            st.getPath().getName()
            for st in self._fs.listStatus(self._jpath(path))
        ]

    def remove(self, path: str) -> None:
        self._fs.delete(self._jpath(path), False)

    def rmdir_if_empty(self, path: str) -> None:
        p = self._jpath(path)
        if not self._fs.listStatus(p):
            self._fs.delete(p, False)

    def exists(self, path: str) -> bool:
        return self._fs.exists(self._jpath(path))


def _io(table_dir: str) -> _LocalIO | _HadoopIO:
    return _LocalIO() if _is_local(table_dir) else _HadoopIO(table_dir)


def _manifest_path(table_dir: str, version: int) -> str:
    return _io(table_dir).join(table_dir, _VERSIONS, f"v{version:010d}.json")


def _read_manifest(table_dir: str, version: int) -> dict:
    return json.loads(_io(table_dir).read_text(_manifest_path(table_dir, version)))


def latest_version(table_dir: str) -> int | None:
    """Current table version via the pointer file; None for an empty or
    uninitialized table."""
    io = _io(table_dir)
    pointer = io.join(table_dir, _LATEST)
    try:
        if isinstance(io, _HadoopIO) and not io.exists(pointer):
            return None
        return int(io.read_text(pointer).strip())
    except (FileNotFoundError, ValueError):
        return None


def _swap_latest(table_dir: str, version: int) -> None:
    io = _io(table_dir)
    tmp = io.join(table_dir, f"{_LATEST}.tmp.{uuid.uuid4().hex[:8]}")
    io.write_text(tmp, str(version))
    io.swap_pointer(tmp, io.join(table_dir, _LATEST))


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
    io = _io(table_dir)
    io.makedirs(io.join(table_dir, _VERSIONS))
    commit_id = uuid.uuid4().hex
    data_dir = io.join(table_dir, "data", commit_id)
    df.write.parquet(data_dir)
    new_files = sorted(
        io.join(data_dir, f)
        for f in io.listdir(data_dir)
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
    io.write_text(_manifest_path(table_dir, version), json.dumps(manifest))
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
    io = _io(table_dir)
    vdir = io.join(table_dir, _VERSIONS)
    out = []
    for name in sorted(io.listdir(vdir)):
        m = json.loads(io.read_text(io.join(vdir, name)))
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
    _io(table_dir).write_text(
        _manifest_path(table_dir, new_version), json.dumps(manifest)
    )
    _swap_latest(table_dir, new_version)
    return new_version


def vacuum(table_dir: str, keep_versions: int = 1) -> list[str]:
    """Delete data files referenced by NO retained manifest (the newest
    ``keep_versions`` manifests are retained, plus any the current
    ``_latest`` points at). Returns the deleted paths. Run only when no
    reader can still hold a pinned frame on an expired version."""
    io = _io(table_dir)
    cur = latest_version(table_dir)
    vdir = io.join(table_dir, _VERSIONS)
    versions = sorted(
        int(n[1:-5]) for n in io.listdir(vdir) if n.endswith(".json")
    )
    keep = set(versions[-keep_versions:])
    if cur is not None:
        keep.add(cur)
    live: set[str] = set()
    for v in keep:
        live.update(_read_manifest(table_dir, v)["files"])
    deleted = []
    data_root = io.join(table_dir, "data")
    for commit_id in io.listdir(data_root):
        cdir = io.join(data_root, commit_id)
        for f in io.listdir(cdir):
            p = io.join(cdir, f)
            if f.endswith(".parquet") and p not in live:
                io.remove(p)
                deleted.append(p)
        io.rmdir_if_empty(cdir)
    for v in versions:
        if v not in keep:
            io.remove(_manifest_path(table_dir, v))
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

    ``order_col`` is batch-arrival metadata, DROPPED before commit — it
    must not be part of the stored table schema. The post-drop update
    schema is validated against the current snapshot's columns up front
    (clear error instead of a mid-job unionByName failure), which also
    catches the first commit accidentally storing the order column.

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
    missing = set(current.columns) - set(updates.columns)
    extra = set(updates.columns) - set(current.columns)
    if missing or extra:
        raise ValueError(
            f"merge_commit: update schema (after dropping order_col) does "
            f"not match table {table_dir!r}: missing={sorted(missing)} "
            f"extra={sorted(extra)}. order_col must not be stored in the "
            f"table; align the update batch to the snapshot schema."
        )
    kept = current.join(
        F.broadcast(updates.select(*keys).distinct()), keys, "left_anti"
    )
    return commit_version(
        kept.unionByName(updates), table_dir, mode="overwrite", note=note
    )
