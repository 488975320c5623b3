"""Tumbling-window resampling (SURVEY.md A4, ST4).

The reference buckets candles with epoch-aligned integer division
``(ts // bucket_seconds) * bucket_seconds`` (api/api_handler.py:788-834).
Spark's ``F.window`` is likewise epoch-aligned for sub-day durations, so
``F.window(ts, "N minutes")`` reproduces the reference's buckets exactly
(SURVEY.md SS7.6). We emit the bucket start as the new candle timestamp.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.exact import dsum


def resample_candles(
    df: DataFrame,
    minutes: int,
    keys: Sequence[str],
    ts_col: str = "timestamp_iso",
    open_col: str = "open",
    high_col: str = "high",
    low_col: str = "low",
    close_col: str = "close",
    volume_col: str = "volume",
    tiebreak: str | None = None,
) -> DataFrame:
    """A4 — aggregate 5m candles into N-minute candles: open = open of
    earliest source candle in the bucket, close = close of the latest,
    high = max, low = min, volume = sum; sorted ascending."""
    order = F.struct(F.col(ts_col), F.col(tiebreak)) if tiebreak else F.col(ts_col)
    w = F.window(F.col(ts_col), f"{minutes} minutes")
    out = (
        df.groupBy(*[F.col(k) for k in keys], w.alias("bucket"))
        .agg(
            F.min_by(F.col(open_col), order).alias("open"),
            F.max(high_col).alias("high"),
            F.min(low_col).alias("low"),
            F.max_by(F.col(close_col), order).alias("close"),
            dsum(volume_col, "volume"),
        )
        .withColumn("bucket_start", F.col("bucket.start"))
        .drop("bucket")
    )
    return out.orderBy(*keys, "bucket_start")


def resample_series(
    df: DataFrame,
    minutes: int,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """A4 over a plain (ts, value) series — produces OHLC-from-ticks:
    the bucket's first/last/max/min value + exact sum + count."""
    order = F.struct(F.col(ts_col), F.col(tiebreak)) if tiebreak else F.col(ts_col)
    v = F.col(value_col)
    w = F.window(F.col(ts_col), f"{minutes} minutes")
    return (
        df.groupBy(*[F.col(k) for k in keys], w.alias("bucket"))
        .agg(
            F.min_by(v, order).alias("open"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.max_by(v, order).alias("close"),
            dsum(v, "total_value"),
            F.count(F.lit(1)).alias("num_records"),
        )
        .withColumn("bucket_start", F.col("bucket.start"))
        .drop("bucket")
    )


def resample_gapfill(
    df: DataFrame,
    minutes: int,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Gap-filled resample: every N-minute bucket between each key's
    first and last observation gets a row; buckets with no source rows
    carry the previous close forward (open=high=low=close=prev close,
    volume-ish fields 0, ``filled`` flag set) — the dense series
    charting/backtesting layers require (a missing 5-minute bar must
    not silently shrink a moving window).

    Plan shape at scale: one resample aggregate (map-side combined),
    then PER KEY a bucket grid via ``sequence()`` + explode — the grid
    is generated from each key's own [min, max] bucket range, so its
    row count is the output's, not (keys x global range) — a left join
    back on (key, bucket) co-partitioned with the grid's shuffle, and
    ONE last_value(ignoreNulls) window for the carry. No driver-side
    loops; every step whole-stage-codegen'd.
    """
    from pyspark.sql import Window

    agg = resample_series(df, minutes, keys, ts_col, value_col, tiebreak)
    step = minutes * 60
    kcols = [F.col(k) for k in keys]
    bounds = agg.groupBy(*kcols).agg(
        F.min("bucket_start").alias("_lo"), F.max("bucket_start").alias("_hi")
    )
    grid = bounds.select(
        *kcols,
        F.explode(
            F.sequence(
                F.col("_lo").cast("timestamp"),
                F.col("_hi").cast("timestamp"),
                F.expr(f"INTERVAL {step} SECONDS"),
            )
        ).alias("bucket_start"),
    )
    joined = grid.join(agg, [*keys, "bucket_start"], "left")
    w = (
        Window.partitionBy(*kcols)
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carry = F.last(F.col("close"), ignorenulls=True).over(w)
    filled = F.col("close").isNull()
    return joined.select(
        *kcols,
        "bucket_start",
        F.coalesce("open", carry).alias("open"),
        F.coalesce("high", carry).alias("high"),
        F.coalesce("low", carry).alias("low"),
        F.coalesce("close", carry).alias("close"),
        F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
        F.coalesce("num_records", F.lit(0).cast("long")).alias("num_records"),
        filled.alias("filled"),
    )
