"""Bucketed table layout — the co-located fact-join lever.

A shuffle on the join key is THE dominant cost of a large fact-fact
join: at 100 TB, `lineitem ⋈ orders` moves both tables across the
cluster every time anyone runs it. Writing both sides bucketed (and
sorted) by the key moves that shuffle to WRITE TIME, once: every
subsequent join of the two tables is planned with zero Exchange under
the SortMergeJoin — Spark matches bucket files pairwise on each
executor (`.explain` shows `Bucketed: true` on both scans and no
Exchange below the join).

Build-once mechanics under Spark's default in-memory catalog: the
bucketed FILES survive on disk (bucket ids are encoded in file names),
but catalog entries do not survive a session — so `ensure_bucketed`
re-registers existing files with a metadata-only
`CREATE TABLE ... CLUSTERED BY ... LOCATION` when it finds the build
marker, and only pays the bucketed write when the source changed
(size+mtime key, the `_ann_index_dir` staleness recipe). On a real
deployment a persistent metastore (Hive/Glue/Unity) makes the
re-registration unnecessary; the write-once layout contract is
identical.

Reference parity: the reference keeps RDS tables keyed for its joins
(sql/rds_schema.sql); bucketing is the Spark-native equivalent of that
physical-layout decision, applied to the lake itself.
"""

from __future__ import annotations

import os
import re
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

__all__ = ["ensure_bucketed", "write_bucketed", "read_table"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a catalog table bucketed (and optionally sorted) by key.

    Sorting within buckets additionally removes the Sort from
    SortMergeJoin and makes per-key window scans sequential I/O.
    The low-level primitive; :func:`ensure_bucketed` wraps it with the
    build-once staleness key and cross-session re-registration."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)

_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "spark-warehouse",
    "bucketed",
)


def _safe(s: str) -> str:
    return re.sub(r"[^A-Za-z0-9_]", "_", s)


def _register(
    spark: SparkSession,
    name: str,
    path: str,
    schema_ddl: str,
    key: str,
    n_buckets: int,
) -> None:
    """Metadata-only CREATE TABLE over already-bucketed files.

    The column list comes from ``StructType.toDDL()`` (Catalyst's own
    DDL printer: backquoted names, correct nested-type syntax) — a
    hand-rolled ``simpleString`` rewrite silently mangles struct inner
    colons and reserved column names (round-9 ADVICE)."""
    spark.sql(
        f"CREATE TABLE {name} ({schema_ddl}) USING PARQUET"
        f" CLUSTERED BY (`{key}`) SORTED BY (`{key}`)"
        f" INTO {n_buckets} BUCKETS LOCATION '{path}'"
    )


def ensure_bucketed(
    spark: SparkSession,
    df: DataFrame,
    source_path: str,
    key: str,
    n_buckets: int = 8,
) -> DataFrame:
    """Return ``df``'s rows as a bucketed-by-``key`` table, building the
    layout once per source version.

    ``source_path`` is the file whose (size, mtime) keys the layout —
    a regenerated source can never be read through stale buckets. The
    bucketed write itself is the one-time shuffle; every later call
    (same or new session) is metadata-only. Concurrency-safe: the
    build happens in a process-private temp directory that is renamed
    into place atomically, so a concurrent reader either sees the
    complete layout (with its `_BUILT` marker) or none of it — never a
    half-written directory. Stale layouts of the SAME source (older
    size+mtime tags, e.g. after testdata regeneration) are pruned when
    a new version is built, so the warehouse does not grow without
    bound across rounds.
    """
    st = os.stat(source_path)
    base = os.path.basename(source_path).split(".")[0]
    prefix = _safe(
        "{}_{}".format(
            base,
            os.path.basename(os.path.normpath(os.path.dirname(source_path))),
        )
    )
    tag = _safe("{}_{}_{}".format(prefix, st.st_size, int(st.st_mtime)))
    name = f"bkt_{tag}"
    path = os.path.join(_ROOT, name)
    marker = os.path.join(path, "_BUILT")
    schema_ddl = df.schema.toDDL()
    if not spark.catalog.tableExists(name):
        if os.path.exists(marker):
            # files exist from an earlier session: metadata-only
            # re-registration with the same bucket spec
            _register(spark, name, path, schema_ddl, key, n_buckets)
        else:
            import shutil

            from pyspark.sql import functions as F

            # one shuffle to align writer partitions with bucket ids
            # (same Murmur3 hash) -> exactly ONE file per bucket, which
            # is the layout Spark's SMJ planner can trust for BOTH
            # exchange AND sort elimination. Built under a pid-private
            # temp name, marked, then renamed into place — rename is
            # the commit point; a losing racer just discards its copy.
            tmp_name = f"{name}__build{os.getpid()}"
            tmp_path = os.path.join(_ROOT, tmp_name)
            (
                df.repartition(n_buckets, F.col(key))
                .write.mode("overwrite")
                .bucketBy(n_buckets, key)
                .sortBy(key)
                .option("path", tmp_path)
                .saveAsTable(tmp_name)
            )
            with open(os.path.join(tmp_path, "_BUILT"), "w") as fh:
                fh.write("ok\n")
            spark.sql(f"DROP TABLE IF EXISTS {tmp_name}")
            try:
                os.rename(tmp_path, path)
            except OSError:
                # another process committed first — use theirs
                shutil.rmtree(tmp_path, ignore_errors=True)
            # GC: older layouts of this same source are unreachable
            # (their size+mtime no longer matches) — drop them so
            # regeneration across rounds doesn't accumulate full
            # copies of fact tables under spark-warehouse/bucketed/.
            # Match siblings STRICTLY as prefix + size + mtime: a bare
            # startswith would also claim layouts of a DIFFERENT source
            # whose sanitized prefix merely extends this one (e.g.
            # 'sf1' vs 'sf1_v2' — likely, since _safe collapses
            # punctuation to '_') and rmtree a layout another session's
            # registered table still points at (round-10 ADVICE).
            sib_pat = re.compile(
                r"^bkt_" + re.escape(prefix) + r"_\d+_\d+$"
            )
            for sib in os.listdir(_ROOT):
                if sib_pat.match(sib) and sib != name:
                    shutil.rmtree(
                        os.path.join(_ROOT, sib), ignore_errors=True
                    )
            _register(spark, name, path, schema_ddl, key, n_buckets)
    return spark.table(name)
