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
    (same or new session) is metadata-only.
    """
    st = os.stat(source_path)
    base = os.path.basename(source_path).split(".")[0]
    tag = _safe(
        "{}_{}_{}_{}".format(
            base,
            os.path.basename(os.path.normpath(os.path.dirname(source_path))),
            st.st_size,
            int(st.st_mtime),
        )
    )
    name = f"bkt_{tag}"
    path = os.path.join(_ROOT, name)
    marker = os.path.join(path, "_BUILT")
    if not spark.catalog.tableExists(name):
        if os.path.exists(marker):
            # files exist from an earlier session: metadata-only
            # re-registration with the same bucket spec
            ddl = df.schema.simpleString()[7:-1].replace(":", " ")
            spark.sql(
                f"CREATE TABLE {name} ({ddl}) USING PARQUET"
                f" CLUSTERED BY ({key}) SORTED BY ({key})"
                f" INTO {n_buckets} BUCKETS LOCATION '{path}'"
            )
        else:
            from pyspark.sql import functions as F

            # one shuffle to align writer partitions with bucket ids
            # (same Murmur3 hash) -> exactly ONE file per bucket, which
            # is the layout Spark's SMJ planner can trust for BOTH
            # exchange AND sort elimination
            (
                df.repartition(n_buckets, F.col(key))
                .write.mode("overwrite")
                .bucketBy(n_buckets, key)
                .sortBy(key)
                .option("path", path)
                .saveAsTable(name)
            )
            with open(marker, "w") as fh:
                fh.write("ok\n")
    return spark.table(name)
