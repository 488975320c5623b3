"""Quick start — the reference's example client flows
(examples/quick_start.py, examples/stock_client.py, quick_api_queries.py)
against this engine: ingest a day of candles, then run every query class.

Run: python examples/quick_start.py
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark import get_spark
from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.plans.analytics import (
    available_symbols,
    daily_summary,
    date_range_stats,
    latest_prices,
    ohlcv_endpoint,
    symbol_stats,
    top_movers_summary,
)
from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.plans.etl import (
    bronze_to_silver,
    run_metadata,
    write_silver,
)
from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.plans.sql_views import (
    register_ohlcv_view,
    run_declared_query,
)
from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.sources.mock import (
    write_mock_envelope_files,
)
from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.sources.raw_json import (
    read_raw_envelopes,
)

SYMBOLS = ["NSE:RELIANCE-EQ", "NSE:TCS-EQ", "NSE:INFY-EQ", "NSE:HDFCBANK-EQ"]


def main() -> None:
    spark = get_spark("quick-start")
    work = tempfile.mkdtemp(prefix="ohlcv_quickstart_")

    # 1. Ingest: two overlapping raw fetches -> bronze zone
    raw_dir = f"{work}/raw"
    Path(raw_dir).mkdir()
    write_mock_envelope_files(spark, raw_dir, SYMBOLS, days=3, fetches=2)

    # 2. ETL: bronze -> partitioned silver parquet (last-wins dedup)
    silver_path = f"{work}/silver"
    raw = read_raw_envelopes(spark, raw_dir)
    write_silver(bronze_to_silver(raw, dedup="last"), silver_path)
    silver = spark.read.parquet(silver_path)
    print("== run metadata ==")
    run_metadata(silver).show(truncate=False)

    # 3. The analytics query set
    print("== symbol_stats(RELIANCE, 2024-01-01) ==")
    symbol_stats(silver, "RELIANCE", "2024-01-01").show()
    print("== daily_summary(2024-01-02) ==")
    daily_summary(silver, "2024-01-02").show()
    print("== date_range(TCS, 01-01..01-03) ==")
    date_range_stats(silver, "TCS", "2024-01-01", "2024-01-03").show()
    gainers, losers = top_movers_summary(silver, "2024-01-02", limit=3)
    print("== top gainers ==")
    gainers.select("symbol_clean", "price_change_percent").show()
    print("== top losers ==")
    losers.select("symbol_clean", "price_change_percent").show()

    # 4. REST-endpoint semantics: range + dedup + resample + tail limit
    print("== /ohlcv/RELIANCE?interval=1h&limit=5 ==")
    ohlcv_endpoint(silver, "RELIANCE", interval="1h", limit=5).select(
        "symbol_clean", "timestamp_iso", "open", "high", "low", "close", "volume"
    ).show()
    print("== /latest ==")
    latest_prices(silver).select("symbol_clean", "timestamp_iso", "latest_price").show()
    print("== /symbols ==")
    available_symbols(silver).show()

    # 5. The declared SQL surface via spark.sql
    register_ohlcv_view(spark, silver)
    print("== SQL: window_daily_summary ==")
    run_declared_query(spark, "window_daily_summary").show(8)

    # 6. Indicator + strategy layer over daily bars (finance operators)
    from pyspark.sql import functions as F

    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.finance import (
        anchored_vwap,
        sma_crossover_backtest,
        stochastic_oscillator,
    )

    daily = silver.groupBy("symbol_clean", F.col("dt").alias("trade_date")).agg(
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.max_by("close", F.col("timestamp_unix")).alias("close"),
        F.sum("volume").cast("long").alias("volume"),
    )
    print("== stochastic %K/%D ==")
    stochastic_oscillator(daily, ["symbol_clean"], "trade_date").select(
        "symbol_clean", "trade_date", "pct_k", "pct_d"
    ).show(6)
    print("== intraday anchored VWAP ==")
    anchored_vwap(
        silver,
        ["symbol_clean"], "dt", "timestamp_unix", "timestamp_unix",
        price_col="close", volume_col="volume",
    ).select("symbol_clean", "timestamp_iso", "close", "vwap").show(6)
    print("== SMA(5/20) crossover backtest ==")
    sma_crossover_backtest(daily, ["symbol_clean"], "trade_date").show()

    # 7. Round-4 indicators: volatility envelope + the two
    # recurrence-class transforms (grouped-map integer folds)
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.finance import (
        heikin_ashi,
        keltner_channels,
        supertrend,
    )

    daily_o = daily.join(
        silver.groupBy(
            "symbol_clean", F.col("dt").alias("trade_date")
        ).agg(F.min_by("open", F.col("timestamp_unix")).alias("open")),
        ["symbol_clean", "trade_date"],
    )
    print("== Keltner channels (SMA tp +/- 2 x SMA TR) ==")
    keltner_channels(daily_o, ["symbol_clean"], "trade_date").select(
        "symbol_clean", "trade_date", "kc_lower", "kc_mid", "kc_upper"
    ).show(6)
    print("== Heikin-Ashi candles ==")
    heikin_ashi(daily_o, ["symbol_clean"], "trade_date").select(
        "symbol_clean", "trade_date", "ha_open", "ha_close"
    ).show(6)
    print("== Supertrend (n=5) ==")
    supertrend(daily_o, ["symbol_clean"], "trade_date", n=5).select(
        "symbol_clean", "trade_date", "trend", "supertrend"
    ).show(8)

    spark.stop()


if __name__ == "__main__":
    main()
