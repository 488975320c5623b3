"""Data-clustered parquet layout for stats-based skipping.

Partition pruning (plans/etl.py's `(symbol_clean, dt)` scheme) eliminates
directories; this module handles the next level down: ordering rows WITHIN
files so parquet column statistics (per file and per row group) become
selective. A scan with a predicate on the cluster key then skips whole
files/row groups via min/max stats — the plain-parquet equivalent of
Delta's OPTIMIZE ZORDER for the single-key case, and the difference
between reading 100 TB and reading the 0.1% a range predicate touches.

``write_clustered`` = `repartitionByRange(cluster_by)` (each output file
owns a disjoint key range — range partitioning is exactly the
one-dimensional clustering objective) + `sortWithinPartitions` (row
groups inside a file are narrow too) + plain parquet write. Repartition
count = files; tune so files land near the row-group size your scans
like. Multi-column `cluster_by` gives hierarchical (lexicographic)
clustering — the right call when queries filter a prefix of the columns;
interleaved (Z-order) clustering only wins when they don't, and needs no
engine support anyway (write a computed Z-value column and cluster by
it).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

__all__ = ["write_clustered", "file_stats"]


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: Sequence[str],
    n_files: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered on ``cluster_by``: range
    repartition (disjoint key ranges per file) + in-file sort."""
    cluster_by = list(cluster_by)
    if n_files:
        out = df.repartitionByRange(n_files, *cluster_by)
    else:
        out = df.repartitionByRange(*cluster_by)
    out.sortWithinPartitions(*cluster_by).write.mode("overwrite").parquet(path)


def file_stats(path: str, column: str) -> list[tuple[str, object, object]]:
    """(file, min, max) of ``column`` from the parquet footers — the
    exact stats a scan's skipping logic consults. Driver-side, one
    footer read per file; used by tests and layout audits."""
    import os

    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        f = os.path.join(path, name)
        md = pq.read_metadata(f)
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == column and col.statistics is not None:
                    s = col.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        out.append((name, lo, hi))
    return out
