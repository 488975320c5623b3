"""Slowly-changing-dimension (type 2) history build from a changelog.

Companion to the MERGE upsert in plans/merge.py: where MERGE keeps only
the latest row per key (the reference's idempotent re-run contract,
etl/lightweight_etl.py:281-282), SCD2 keeps every attribute VERSION with
its validity interval — the standard lakehouse dimension shape, and the
input a training pipeline needs for "as of time T" feature joins
(pairs with operators/joins.as_of_join).

Scale notes: both windows (change detection, interval close) partition
on the SAME key, so Spark plans one exchange and two sorts; no groupBy,
no second shuffle. State per key is its version count, not its event
count — consecutive no-op rows are dropped before the second window.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_history"]


def scd2_history(
    changelog: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    id_col: str,
    attr_cols: Sequence[str],
) -> DataFrame:
    """Collapse a changelog into SCD2 rows.

    A new version starts at the first event (per key, ordered by
    (ts, id)) whose tracked attributes differ from the previous event's;
    consecutive events carrying the same attributes collapse into one
    version. Each version gets ``valid_from`` (its first ts),
    ``valid_to`` (the next version's ``valid_from``, NULL while open),
    ``version`` (1-based) and ``is_current``.

    Null-safe comparison (``eqNullSafe``) means NULL→NULL is "no
    change", NULL→value is a change — matching SQL ``IS DISTINCT FROM``
    so the oracle twin replays exactly.
    """
    order = [F.col(ts_col), F.col(id_col)]
    w = Window.partitionBy(*keys).orderBy(*order)
    changed = F.lit(False)
    for a in attr_cols:
        prev = F.lag(F.col(a)).over(w)
        changed = changed | ~F.col(a).eqNullSafe(prev)
    first = F.row_number().over(w) == 1
    versions = changelog.select(
        *keys, ts_col, id_col, *attr_cols,
        (first | changed).alias("_is_change"),
    ).filter(F.col("_is_change"))
    w2 = Window.partitionBy(*keys).orderBy(*order)
    valid_to = F.lead(F.col(ts_col)).over(w2)
    return versions.select(
        *keys,
        F.col(ts_col).alias("valid_from"),
        valid_to.alias("valid_to"),
        F.row_number().over(w2).cast("long").alias("version"),
        valid_to.isNull().alias("is_current"),
        *attr_cols,
    )
