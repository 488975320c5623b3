"""Distributed global rank — two-pass row_number without a single-task sort.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY collapses the
whole input into ONE task (Spark plans a global Sort into a single
partition for an ungrouped window).  That is fine for a handful of rows
and a scale bug for anything sizeable.  This module provides the classic
two-pass replacement:

1. ``repartitionByRange`` on the sort key — Spark's RangePartitioner
   gives ordered, non-overlapping key ranges across ``P`` partitions.
2. Stamp each row with its range-partition id and pin the assignment
   with ``localCheckpoint`` (both downstream branches must see the SAME
   assignment; range sampling is not contractually deterministic across
   recomputation).
3. Count rows per partition — the only "global" data is one (pid, count)
   row per partition (P ≈ shuffle partitions, never data-sized),
   collected and prefix-summed driver-side.
4. Inline the offsets as a literal pid->offset map and add a
   PER-PARTITION ``row_number`` (``PARTITION BY pid`` — a keyed,
   distributed window; no ungrouped WindowExec anywhere).

The result is bit-identical to the global ``row_number`` whenever the
full sort key is a total order (callers append a unique tie-break column,
as all in-repo callers do): global_rank = partition_offset + local_rank.

Reference parity: the reference engine's ranked exports
(`analytics/queries.py` top-N / ledger endpoints) use single-node sorts —
trivially total-ordered there; this is the distributed re-expression.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "distributed_row_number",
    "distributed_running_sum",
    "packed_running_sum",
]

_PID = "__dr_pid"


def distributed_row_number(
    df: DataFrame,
    order_by: Sequence[Column],
    rank_col: str = "_rk",
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Append ``rank_col`` = global row_number over ``order_by``, distributed.

    ``order_by`` must be a TOTAL order (include a unique tie-break column)
    — with a total order the two-pass rank is exactly the ungrouped
    ``row_number() OVER (ORDER BY ...)``, but no stage ever sorts more
    than one range partition in one task.

    The input is localCheckpoint-ed (materialized once, lineage cut) so
    the per-partition counts and the per-partition local ranks are
    computed over the SAME range assignment.  Driver-side data: one
    (pid, count) row per partition — bounded at ``num_partitions``,
    never data-sized — folded into a literal pid->offset map.

    **EAGER, not lazy** (round-9 ADVICE): calling this function runs
    two Spark jobs immediately (the localCheckpoint materialization and
    the P-row count collect) and pins the result to a snapshot of the
    input as of the call.  Treat it as an action: build the input plan
    fully first, and do not expect later mutations of the underlying
    source to be reflected in the returned DataFrame.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    order_by = list(order_by)

    # Materialize the INPUT before the range exchange: the
    # RangePartitioner's bounds-sampling job executes the child once and
    # the shuffle map pass executes it again, so an expensive upstream
    # pipeline ran TWICE per rank. Checkpointing first makes both passes
    # read the materialized rows; the transient storage is the same
    # narrow (keys, order-cols) table the checkpoint below already pins.
    stamped = (
        df.localCheckpoint()
        .repartitionByRange(num_partitions, *order_by)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint()
    )

    # One count row per range partition — bounded at ``num_partitions``
    # BY CONSTRUCTION, so the prefix sum is a driver-side fold over a
    # P-row collect (same bounded-artifact class as the centroid
    # tables), inlined back as a literal pid->offset map.  ``stamped``
    # is already materialized by the localCheckpoint, so this triggers
    # no recomputation; vs the previous unpartitioned-window + broadcast
    # join it removes one Exchange AND the WindowExec "No Partition
    # Defined" warning that fired 6x per ranked query (a
    # forgot-partitionBy heuristic crying wolf on a 32-row table — a
    # foldable partitionBy(lit) is optimizer-stripped, so the honest
    # fix is to not plan a window at all).
    counts = stamped.groupBy(_PID).agg(F.count(F.lit(1)).alias("_c")).collect()
    acc = 0
    off_pairs: list[Column] = []
    for row in sorted(counts, key=lambda r: r[_PID]):
        off_pairs += [F.lit(row[_PID]), F.lit(acc)]
        acc += row["_c"]
    # empty input -> no partitions -> every offset is 0 (an argless
    # create_map() is map<void,void> and cannot be indexed)
    off_map = (
        F.create_map(*off_pairs)[F.col(_PID)]
        if off_pairs
        else F.lit(0)
    )

    local_w = Window.partitionBy(_PID).orderBy(*order_by)
    ranked = stamped.withColumn(
        rank_col,
        (
            F.coalesce(off_map, F.lit(0)).cast("long")
            + F.row_number().over(local_w)
        ).cast("long"),
    ).drop(_PID)
    return ranked


def distributed_running_sum(
    df: DataFrame,
    order_by: Sequence[Column],
    value_col: str,
    out_col: str = "_csum",
    num_partitions: Optional[int] = None,
    total_col: Optional[str] = None,
) -> DataFrame:
    """Append ``out_col`` = running BIGINT sum of ``value_col`` over the
    total order ``order_by`` — the ``distributed_row_number`` machinery
    applied to ``sum`` instead of ``row_number``.

    ``sum(v) OVER (ORDER BY ...)`` with no PARTITION BY is the same
    single-task scale bug as the ungrouped row_number (and fires the
    same WindowExec warning): Spark sorts the whole input in one
    partition.  Here: range-partition on the key, pin the assignment
    (localCheckpoint), per-partition value totals collected driver-side
    (bounded at ``num_partitions`` rows), inlined as a literal
    pid->offset map, then a per-partition keyed cumulative window.
    Bit-identical to the global running sum for BIGINT values under a
    total order (integer addition is associative; callers pass distinct
    keys or append a tie-break).

    **EAGER, not lazy** (round-9 ADVICE): calling this function runs
    two Spark jobs immediately (localCheckpoint + the P-row totals
    collect) and snapshots the input as of the call — treat it as an
    action, not a plan transformation."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    order_by = list(order_by)

    # Materialize the INPUT before the range exchange: the
    # RangePartitioner's bounds-sampling job executes the child once and
    # the shuffle map pass executes it again, so an expensive upstream
    # pipeline ran TWICE per rank. Checkpointing first makes both passes
    # read the materialized rows; the transient storage is the same
    # narrow (keys, order-cols) table the checkpoint below already pins.
    stamped = (
        df.localCheckpoint()
        .repartitionByRange(num_partitions, *order_by)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint()
    )
    totals = (
        stamped.groupBy(_PID)
        .agg(F.sum(value_col).cast("long").alias("_s"))
        .collect()
    )
    acc = 0
    off_pairs: list[Column] = []
    for row in sorted(totals, key=lambda r: r[_PID]):
        off_pairs += [F.lit(row[_PID]), F.lit(acc)]
        acc += row["_s"] or 0
    # empty input -> no partitions -> every offset is 0 (an argless
    # create_map() is map<void,void> and cannot be indexed)
    off_map = (
        F.create_map(*off_pairs)[F.col(_PID)]
        if off_pairs
        else F.lit(0)
    )

    local_w = (
        Window.partitionBy(_PID)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = stamped.withColumn(
        out_col,
        (
            F.coalesce(off_map, F.lit(0)).cast("long")
            + F.sum(value_col).over(local_w).cast("long")
        ).cast("long"),
    ).drop(_PID)
    if total_col is not None:
        # the grand total fell out of the offset fold — a driver-known
        # constant, so it inlines as a literal (no second pass, no
        # one-row cross join)
        out = out.withColumn(total_col, F.lit(acc).cast("long"))
    return out


def packed_running_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "_csum",
) -> DataFrame:
    """LAZY running BIGINT sum for PROVABLY BOUNDED tables: pack the
    whole table into one sorted array, compute each prefix with an
    in-array fold, re-expand with ``explode``.

    The bounded-table counterpart of :func:`distributed_running_sum`
    (which stays fully distributed but runs two eager jobs at call
    time — round-9 ADVICE). Use THIS variant when the input is bounded
    by construction — an offset grid, a per-bucket summary, a
    distinct-value histogram of a range-bounded metric — i.e. at most
    ~10^4 rows at ANY data scale. The whole table passes through one
    aggregation buffer and the prefix fold is O(n^2) in-memory work,
    so the bound is a hard contract, not a hint; for anything
    row-count-shaped, use :func:`distributed_running_sum`.

    ``order_col`` leads the packed struct, so ``sort_array`` orders by
    it first (remaining columns tie-break; pass distinct keys for a
    total order, as with the distributed variant). Fully lazy: no job
    runs until the result is consumed.
    """
    cols = df.columns
    rest = [c for c in cols if c != order_col]
    packed = df.select(
        F.struct(
            F.col(order_col).alias(order_col),
            *[F.col(c).alias(c) for c in rest],
        ).alias("_e")
    ).agg(F.sort_array(F.collect_list("_e")).alias("_a"))
    stepped = packed.select(
        F.transform(
            "_a",
            lambda x, i: x.withField(
                out_col,
                F.aggregate(
                    F.slice(F.col("_a"), F.lit(1), i + F.lit(1)),
                    F.lit(0).cast("long"),
                    lambda a, e: a + e[value_col].cast("long"),
                ),
            ),
        ).alias("_a")
    )
    ex = stepped.select(F.explode("_a").alias("_e"))
    return ex.select(
        *[F.col("_e")[c].alias(c) for c in cols],
        F.col("_e")[out_col].alias(out_col),
    )
