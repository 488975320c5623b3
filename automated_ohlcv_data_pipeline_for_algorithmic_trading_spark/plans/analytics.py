"""The query APIs (SURVEY.md SS3.1-3.2) as pure DataFrame functions over
the silver candle table: the four analytics Lambda query types
(analytics/lambda_analytics.py) and the REST handler pipelines
(api/api_handler.py), minus the reference's silent truncation caps
(SURVEY.md SS7.8 — we take explicit ranges instead).

Each function is lazy; partition pruning on (symbol_clean, year, month,
day) replaces the reference's hand-built S3 prefixes (SS4).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.candles import price_change_cols
from ..functions.timeparse import interval_to_minutes, period_to_timedelta
from ..operators.dedup import dedup_by_key
from ..operators.resample import resample_candles
from ..operators.rollup import latest_snapshot, ohlcv_daily_rollup
from ..operators.topk import tail_limit, top_movers


def _day_filter(df: DataFrame, date: str) -> DataFrame:
    d = dt.date.fromisoformat(date)
    # dt equality prunes the partition directory; the year/month/day
    # predicates additionally hit parquet row-group stats when the input
    # is an unpartitioned table (e.g. a one-file extract)
    preds = (F.col("year") == d.year) & (F.col("month") == d.month) & (F.col("day") == d.day)
    if "dt" in df.columns:
        preds = (F.col("dt") == d.isoformat()) & preds
    return df.filter(preds)


def symbol_stats(silver: DataFrame, symbol_clean: str, date: str) -> DataFrame:
    """query_type=symbol_stats — one symbol, one day, the A1 rollup
    (analytics/lambda_analytics.py:99-207)."""
    day = _day_filter(silver.filter(F.col("symbol_clean") == symbol_clean), date)
    return ohlcv_daily_rollup(day, ["symbol_clean"])


def daily_summary(silver: DataFrame, date: str) -> DataFrame:
    """query_type=daily_summary — all symbols for a day, with derived
    price-change columns, sorted by pct desc
    (analytics/lambda_analytics.py:210-321)."""
    day = _day_filter(silver, date)
    rolled = ohlcv_daily_rollup(day, ["symbol_clean"])
    return price_change_cols(rolled).orderBy(F.col("price_change_percent").desc())


def date_range_stats(
    silver: DataFrame, symbol_clean: str, from_date: str, to_date: str
) -> DataFrame:
    """query_type=date_range — per-day rollups across a range; the
    reference loops days sequentially (analytics/lambda_analytics.py:324-344),
    here it is one pruned scan + one groupBy."""
    return ohlcv_daily_rollup(
        silver.filter(
            (F.col("symbol_clean") == symbol_clean)
            & F.to_date("timestamp_iso").between(from_date, to_date)
        ),
        ["symbol_clean"],
    ).orderBy("trade_date")


def top_movers_summary(
    silver: DataFrame, date: str, limit: int = 10
) -> tuple[DataFrame, DataFrame]:
    """query_type=top_movers — gainers/losers over ONE cached daily
    summary (the reference reuses its daily_summary result the same way,
    analytics/lambda_analytics.py:393-403)."""
    summary = daily_summary(silver, date).cache()
    return top_movers(summary, limit=limit)


def ohlcv_endpoint(
    silver: DataFrame,
    symbol_clean: str,
    from_date: str | None = None,
    to_date: str | None = None,
    interval: str = "5m",
    limit: int | None = None,
    dedup: str = "last",
) -> DataFrame:
    """GET /ohlcv/{symbol} (SS3.1): symbol filter -> ts-range filter ->
    last-wins dedup by timestamp -> asc sort -> tail limit -> optional
    resample to the requested interval (api/api_handler.py:365-443,
    :654-743)."""
    df = silver.filter(F.col("symbol_clean") == symbol_clean)
    if from_date:
        df = df.filter(F.to_date("timestamp_iso") >= from_date)
    if to_date:
        # inclusive end-of-day bound (parse_date_to_timestamp 23:59:59,
        # api/api_handler.py:305-328)
        df = df.filter(F.to_date("timestamp_iso") <= to_date)
    df = dedup_by_key(
        df, ["symbol_clean", "timestamp_unix"], ["_file_seq", "fetch_timestamp"]
        if "_file_seq" in df.columns else ["fetch_timestamp"], keep=dedup,
    )
    minutes = interval_to_minutes(interval)
    if minutes != 5:
        df = resample_candles(
            df, minutes, ["symbol_clean"], "timestamp_iso",
            tiebreak="timestamp_unix",
        ).withColumnRenamed("bucket_start", "timestamp_iso")
    if limit:
        return tail_limit(df, "timestamp_iso", limit)
    return df.orderBy("timestamp_iso")


def historical_lookback(
    silver: DataFrame, symbol_clean: str, period: str, now: dt.datetime
) -> DataFrame:
    """GET /historical/{symbol}?period=3m — period-token lookback with the
    reference's 30d/365d month/year approximations
    (api/api_handler.py:746-769); ``now`` is explicit for determinism."""
    cutoff = now - period_to_timedelta(period)
    return (
        silver.filter(
            (F.col("symbol_clean") == symbol_clean)
            & (F.col("timestamp_iso") >= F.lit(cutoff))
        )
        .orderBy("timestamp_iso")
    )


def latest_prices(silver: DataFrame) -> DataFrame:
    """GET /latest — last candle per symbol, latest_price = its close
    (api/api_handler.py:479-514)."""
    return latest_snapshot(
        silver, ["symbol_clean"], "timestamp_iso", tiebreak="timestamp_unix"
    ).withColumn("latest_price", F.col("close"))


def volatile_days(daily_summary_df: DataFrame, threshold: float = 2.0) -> DataFrame:
    """P11/O7 — days with |price_change_percent| above threshold, ranked
    by magnitude (examples/query_analytics.py:181-196)."""
    return daily_summary_df.filter(
        F.abs(F.col("price_change_percent")) > threshold
    ).orderBy(F.abs(F.col("price_change_percent")).desc())


def trading_hours_only(df: DataFrame, ts_col: str = "timestamp_iso") -> DataFrame:
    """P13 — keep candles inside the NSE session: Mon-Fri, 09:15-15:30 IST
    (the reference gates ingestion on this wall-clock window,
    ingestion/lambda_ingestion.py:28-58; as a data predicate it filters on
    the event time converted to IST)."""
    ist = F.from_utc_timestamp(F.col(ts_col), "Asia/Kolkata")
    minutes = F.hour(ist) * 60 + F.minute(ist)
    return df.filter(
        (F.dayofweek(ist).between(2, 6))  # Mon=2 .. Fri=6
        & (minutes >= 9 * 60 + 15)
        & (minutes <= 15 * 60 + 30)
    )


def available_symbols(silver: DataFrame) -> DataFrame:
    """GET /symbols — partition discovery becomes a distinct over the
    partition column (api/api_handler_csv.py:31-54)."""
    return silver.select("symbol_clean").distinct().orderBy("symbol_clean")
