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
   row per partition, prefix-summed with a window over P rows (P ≈
   shuffle partitions, never data-sized).
4. Broadcast the offsets back and add a PER-PARTITION ``row_number``
   (``PARTITION BY pid`` — a keyed, distributed window).

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

__all__ = ["distributed_row_number"]

_PID = "__dr_pid"
_OFF = "__dr_off"


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
    computed over the SAME range assignment.  Driver-side data: none;
    the offset table is one row per partition and stays a DataFrame
    (broadcast-joined back).
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    order_by = list(order_by)

    stamped = (
        df.repartitionByRange(num_partitions, *order_by)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint()
    )

    # One row per range partition; the prefix-sum window runs over P rows
    # (32-ish), never over the data.
    counts = stamped.groupBy(_PID).agg(F.count(F.lit(1)).alias("_c"))
    off_w = (
        Window.orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        _PID,
        F.coalesce(F.sum("_c").over(off_w), F.lit(0)).cast("long").alias(_OFF),
    )

    local_w = Window.partitionBy(_PID).orderBy(*order_by)
    ranked = (
        stamped.join(F.broadcast(offsets), _PID)
        .withColumn(
            rank_col,
            (F.col(_OFF) + F.row_number().over(local_w)).cast("long"),
        )
        .drop(_PID, _OFF)
    )
    return ranked
