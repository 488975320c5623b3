"""The declared SQL surface (SURVEY.md SS3.3): the Athena view with
computed columns and the five canonical queries, runnable verbatim-ish via
``spark.sql`` — here Catalyst is the real engine behind the SQL the
reference could only declare.

View semantics: sql/athena_parquet_tables.sql:43-66 (computed columns F8)
over the silver candle table; queries :71-144 including the
window-function daily summary (W1-W4) and dispersion stats (A3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

OHLCV_VIEW = "ohlcv_view"


def register_ohlcv_view(
    spark: SparkSession, silver: DataFrame, name: str = OHLCV_VIEW
) -> None:
    """CREATE OR REPLACE TEMP VIEW with the derived columns of the
    reference's ohlcv_analysis_view (guarded divisions — SURVEY.md SS7.5)."""
    silver.createOrReplaceTempView(f"{name}_base")
    spark.sql(
        f"""
        CREATE OR REPLACE TEMPORARY VIEW {name} AS
        SELECT *,
               close - open AS price_change,
               CASE WHEN open != 0 THEN (close - open) / open * 100 ELSE 0.0 END
                   AS price_change_percent,
               high - low AS daily_range,
               CASE WHEN open != 0 THEN (high - low) / open * 100 ELSE 0.0 END
                   AS volatility_percent,
               to_date(timestamp_iso) AS trade_date
        FROM {name}_base
        """
    )


# The declared query set (sql/athena_parquet_tables.sql:71-144), minimally
# edited for Spark SQL (identical semantics; Presto STDDEV == Spark stddev,
# both sample).

LATEST_CANDLES = f"""
SELECT * FROM {OHLCV_VIEW}
ORDER BY timestamp_iso DESC, symbol_clean
LIMIT 100
"""

TOP_VOLUME_SYMBOLS = f"""
SELECT symbol_clean,
       sum(volume) AS total_volume,
       avg(close) AS avg_close,
       count(*) AS record_count,
       max(timestamp_iso) AS latest_timestamp
FROM {OHLCV_VIEW}
GROUP BY symbol_clean
ORDER BY total_volume DESC
LIMIT 10
"""

DAILY_AGGREGATE = f"""
SELECT symbol_clean, trade_date,
       max(high) AS day_high,
       min(low) AS day_low,
       sum(volume) AS total_volume,
       avg(close) AS avg_close,
       count(*) AS candle_count
FROM {OHLCV_VIEW}
GROUP BY symbol_clean, trade_date
ORDER BY trade_date DESC, total_volume DESC
"""

VOLATILITY_STATS = f"""
SELECT symbol_clean,
       avg(volatility_percent) AS avg_volatility,
       stddev(price_change_percent) AS stddev_change,
       max(price_change_percent) AS max_gain,
       min(price_change_percent) AS max_loss
FROM {OHLCV_VIEW}
GROUP BY symbol_clean
ORDER BY avg_volatility DESC
"""

WINDOW_DAILY_SUMMARY = f"""
WITH windowed AS (
    SELECT DISTINCT symbol_clean, trade_date,
           first_value(open) OVER w AS day_open,
           last_value(close) OVER (
               PARTITION BY symbol_clean, trade_date ORDER BY timestamp_iso
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS day_close,
           sum(volume) OVER (PARTITION BY symbol_clean, trade_date) AS day_volume
    FROM {OHLCV_VIEW}
    WINDOW w AS (PARTITION BY symbol_clean, trade_date ORDER BY timestamp_iso)
)
SELECT symbol_clean, trade_date, day_open, day_close, day_volume,
       CASE WHEN day_open != 0
            THEN (day_close - day_open) / day_open * 100 ELSE 0.0 END
           AS daily_return_percent
FROM windowed
ORDER BY trade_date DESC, daily_return_percent DESC
"""

DECLARED_QUERIES = {
    "latest_candles": LATEST_CANDLES,
    "top_volume_symbols": TOP_VOLUME_SYMBOLS,
    "daily_aggregate": DAILY_AGGREGATE,
    "volatility_stats": VOLATILITY_STATS,
    "window_daily_summary": WINDOW_DAILY_SUMMARY,
}


def run_declared_query(spark: SparkSession, name: str) -> DataFrame:
    return spark.sql(DECLARED_QUERIES[name])
