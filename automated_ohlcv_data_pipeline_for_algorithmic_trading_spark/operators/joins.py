"""Joins (SURVEY.md SS2.7). The reference declares but never executes its
joins (security_master / marketcap_snapshot dimensions, sql/rds_schema.sql)
— here they are first-class.

Strategy at scale: dimensions (thousands-to-millions of rows) broadcast;
fact-fact joins shuffle on the join key and rely on AQE for skew. As-of
joins (not in the reference, standard for market data) are implemented by
composition: union + per-key window fill — no Python in the loop.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def enrich(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str] | str,
    how: str = "left",
    broadcast: bool = True,
) -> DataFrame:
    """J1/J2 — enrich a fact table with a dimension. ``broadcast=True``
    (default) hints a broadcast-hash join: no shuffle of the fact side."""
    d = F.broadcast(dim) if broadcast else dim
    return fact.join(d, on=on, how=how)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    keys: Sequence[str],
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Interval (range) join: every (point, interval) pair with
    ``start <= point_ts < end``, per key — as a BUCKETED EQUI-JOIN, not a
    theta join.

    Each interval explodes into the fixed time buckets it covers; points
    carry their single bucket; the join runs on (keys, bucket) — one
    shuffle whose size is points + intervals x mean_buckets — then the
    exact range predicate filters residuals. A point lives in exactly one
    bucket, so no pair duplicates and no distinct. At 100 TB this is the
    difference between a broadcast-nested-loop scan and an ordinary
    shuffle join; pick ``bucket_seconds`` near the typical interval
    length so mean_buckets stays ~1-2.

    Columns from both sides are kept (callers select); timestamps compare
    at microsecond precision.
    """
    keys = list(keys)
    us = int(bucket_seconds) * 1_000_000
    # integer div, not double division + cast: at 1e15 micros a double
    # quotient can land one ulp under an exact integer and truncate into
    # the previous bucket
    p = points.withColumn("_bucket", F.expr(f"unix_micros({point_ts}) div {us}"))
    i = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.expr(f"unix_micros({start_ts}) div {us}"),
                # end is exclusive, but a point in end's bucket can still
                # precede it — include the boundary bucket
                F.expr(f"unix_micros({end_ts}) div {us}"),
            )
        ),
    )
    joined = p.join(i, [*keys, "_bucket"]).filter(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) < F.col(end_ts))
    )
    return joined.drop("_bucket")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    suffix: str = "_asof",
    tiebreak: str | None = None,
    tolerance: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, attach the latest right row with
    ``right_ts <= left_ts`` (backward; forward = earliest >=) per key.

    Implemented as union + last-non-null window fill rather than a range
    join: one shuffle on (keys), one ordered scan — O(n log n) per key,
    no quadratic candidate pairs, no Python. This is the J2 semantics for
    sparse ``marketcap_snapshot`` dates (SURVEY.md SS2.7).

    ``tiebreak``: a right-side column ordering equal-timestamp right rows
    (latest wins backward / earliest wins forward) — required for
    determinism when right timestamps are not unique per key.

    ``tolerance``: max staleness as a SQL interval string (e.g.
    ``"30 days"``, pandas ``merge_asof(tolerance=...)`` semantics): a
    match older than ``left_ts - tolerance`` (backward; newer than
    ``left_ts + tolerance`` forward) yields NULLs instead. Because the
    as-of match is always the NEWEST candidate (backward), checking the
    single matched row equals restricting the join to in-tolerance rows
    — the plan stays one fill window plus a per-row comparison, no
    second pass.

    The fill is ROW-ATOMIC: all right value columns (and the matched
    timestamp the tolerance check reads) are packed into ONE struct and
    last-non-null-filled together, so every output row's values come
    from the single matched right row — a NULL inside a right value
    column stays NULL (merge_asof semantics) instead of leaking an
    older row's value past the tolerance window. One window expression
    regardless of value-column count.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(direction)
    keys = list(keys)
    val_cols = [c for c in right.columns if c not in (*keys, right_ts)]

    lhs = left.withColumn("_ts", F.col(left_ts)).withColumn("_src", F.lit(1))
    rhs = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        *[F.col(c).alias(c + suffix) for c in val_cols],
    ).withColumn("_src", F.lit(0))
    if tiebreak:
        rhs = rhs.withColumn("_tb", F.col(tiebreak + suffix))
        lhs = lhs.withColumn("_tb", F.lit(None).cast(dict(rhs.dtypes)["_tb"]))
    merged = lhs.unionByName(rhs, allowMissingColumns=True)
    # pack the matched row: non-null exactly on right rows, so a single
    # last-non-null fill carries the WHOLE matched row (values + its ts)
    merged = merged.withColumn(
        "_rrow",
        F.when(
            F.col("_src") == 0,
            F.struct(
                F.col("_ts").alias("_rts"),
                *[F.col(c + suffix) for c in val_cols],
            ),
        ),
    )

    if direction == "backward":
        # right rows sort before left rows at the same ts -> inclusive
        # match; among tied right rows the greatest tiebreak is filled last
        tb = [F.col("_tb").asc()] if tiebreak else []
        order = [F.col("_ts").asc(), F.col("_src").asc(), *tb]
    else:
        # earliest tiebreak wins forward -> make it the last filled
        tb = [F.col("_tb").desc()] if tiebreak else []
        order = [F.col("_ts").desc(), F.col("_src").asc(), *tb]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = merged.withColumn(
        "_rrow", F.last(F.col("_rrow"), ignorenulls=True).over(w)
    )
    if tolerance is not None:
        iv = F.expr(f"INTERVAL {tolerance}")
        if direction == "backward":
            in_tol = F.col("_rrow._rts") >= F.col("_ts") - iv
        else:
            in_tol = F.col("_rrow._rts") <= F.col("_ts") + iv
        take = F.when(in_tol, F.col("_rrow"))
    else:
        take = F.col("_rrow")
    for c in val_cols:
        out = out.withColumn(c + suffix, take[c + suffix])
    out = out.filter(F.col("_src") == 1).drop("_src", "_ts", "_rrow")
    return out.drop("_tb") if tiebreak else out
