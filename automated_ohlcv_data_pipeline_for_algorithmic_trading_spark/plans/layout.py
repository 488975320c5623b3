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

__all__ = ["write_clustered", "file_stats", "zorder_value", "write_zordered"]


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


def zorder_value(cols: Sequence[str], bits: int = 16):
    """Interleaved (Morton / Z-order) value over two numeric rank
    columns — multi-dimensional clustering with NO engine support
    needed: compute the Z-value, then range-cluster on it. Wins over
    lexicographic `cluster_by` exactly when scans filter on the
    SECOND dimension alone (lexicographic files span that column's
    full range; Z-ordered files cover bounded rectangles in BOTH).

    ``cols`` are 0..2^bits-1 integer ranks (quantize upstream — see
    ``write_zordered``). Bit spreading uses the classic mask-multiply
    ladder (4 shift/mask ops per column), not a 2*bits-term unrolled
    expression, keeping the codegen'd expression small (NOTES.md: wide
    unrolls blow past JIT limits). NOTE: the hardcoded ladder constants
    (0x00FF00FF / 0x0F0F0F0F / 0x33333333 / 0x55555555) are correct
    ONLY for ranks that fit 16 bits — the ``bits <= 16`` guard below is
    load-bearing; widening the guard requires deriving wider masks from
    ``bits`` (e.g. the 64-bit ladder starting at 0x0000FFFF0000FFFF),
    or the interleave silently corrupts.
    """
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    if len(cols) != 2:
        raise ValueError("zorder_value interleaves exactly 2 columns")
    if bits > 16:
        raise ValueError("bits <= 16 (interleaved result must fit a long)")

    def spread_col(name: str) -> Column:
        x = F.col(name).cast("long")
        x = (F.shiftleft(x, 8).bitwiseOR(x)).bitwiseAND(F.lit(0x00FF00FF))
        x = (F.shiftleft(x, 4).bitwiseOR(x)).bitwiseAND(F.lit(0x0F0F0F0F))
        x = (F.shiftleft(x, 2).bitwiseOR(x)).bitwiseAND(F.lit(0x33333333))
        x = (F.shiftleft(x, 1).bitwiseOR(x)).bitwiseAND(F.lit(0x55555555))
        return x

    a, b = cols
    return spread_col(a).bitwiseOR(F.shiftleft(spread_col(b), 1))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Z-order-clustered parquet write over two numeric columns: rank
    each column to 0..2^bits-1 (min/max scaling from one tiny agg pass
    — the same two-pass shape as any OPTIMIZE job), interleave into a
    Z-value, range-partition + sort on it, drop it before writing.
    Every output file then covers a bounded RECTANGLE in (colA, colB)
    space, so parquet min/max stats skip files for predicates on either
    column or both."""
    from pyspark.sql import functions as F

    a, b = list(cols)
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(a), F.max(a), F.min(b), F.max(b)
    ).collect()[0]
    if lo_a is None or lo_b is None:
        # empty input: nothing to rank — write the (empty) dataset with
        # the original schema, like write_clustered would
        df.write.mode("overwrite").parquet(path)
        return
    span_a = max(1e-12, float(hi_a) - float(lo_a))
    span_b = max(1e-12, float(hi_b) - float(lo_b))
    mx = (1 << bits) - 1

    def rank(col: str, lo: float, span: float):
        return F.least(
            F.lit(mx),
            F.floor((F.col(col) - F.lit(lo)) / F.lit(span) * F.lit(mx)),
        ).cast("long")

    ranked = df.withColumn("_ra", rank(a, float(lo_a), span_a)).withColumn(
        "_rb", rank(b, float(lo_b), span_b)
    )
    z = ranked.withColumn("_z", zorder_value(["_ra", "_rb"], bits))
    (
        z.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_ra", "_rb", "_z")
        .write.mode("overwrite")
        .parquet(path)
    )
