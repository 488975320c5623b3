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
