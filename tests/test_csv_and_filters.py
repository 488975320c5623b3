"""CSV round-trip (S5/S11), raw JSON sink (S14), volatility and
trading-hours predicates (P11/P13)."""

from __future__ import annotations

from pyspark.sql import functions as F

from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.plans.analytics import (
    daily_summary,
    trading_hours_only,
    volatile_days,
)
from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.plans.etl import (
    bronze_to_silver,
    read_silver_csv,
    silver_csv_sink,
)
from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.sources.mock import (
    write_mock_envelope_files,
)
from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.sources.raw_json import (
    read_raw_envelopes,
    write_raw_json,
)


def _silver(spark, tmp_path):
    raw_dir = tmp_path / "raw"
    raw_dir.mkdir()
    write_mock_envelope_files(spark, str(raw_dir), ["NSE:RELIANCE-EQ", "NSE:TCS-EQ"], days=1)
    return bronze_to_silver(read_raw_envelopes(spark, str(raw_dir)), dedup="last")


def test_csv_gz_roundtrip(spark, tmp_path):
    silver = _silver(spark, tmp_path)
    out = str(tmp_path / "csv")
    silver_csv_sink(silver, out)
    back = read_silver_csv(spark, out)
    assert back.count() == silver.count() == 150
    a = {(r["timestamp_unix"]): r["close"] for r in silver.filter(F.col("symbol_clean") == "TCS").collect()}
    b = {(r["timestamp_unix"]): r["close"] for r in back.filter(F.col("symbol_clean") == "TCS").collect()}
    assert a == b  # typed round-trip through gzip CSV is lossless
    import glob

    assert glob.glob(f"{out}/symbol_clean=*/dt=*/*.csv.gz")


def test_raw_json_sink_roundtrip(spark, tmp_path):
    raw_dir = tmp_path / "raw"
    raw_dir.mkdir()
    write_mock_envelope_files(spark, str(raw_dir), ["NSE:INFY-EQ"], days=1)
    raw = read_raw_envelopes(spark, str(raw_dir))
    sink = str(tmp_path / "bronze")
    write_raw_json(raw, sink)
    back = read_raw_envelopes(spark, sink, multi_line=False)
    assert bronze_to_silver(back, dedup="last").count() == 75


def test_volatile_days_filter(spark, tmp_path):
    silver = _silver(spark, tmp_path)
    summary = daily_summary(silver, "2024-01-01")
    vol = volatile_days(summary, threshold=0.0).collect()
    assert len(vol) == 2  # every symbol moves with threshold 0
    assert volatile_days(summary, threshold=1e9).count() == 0


def test_trading_hours_predicate(spark, tmp_path):
    silver = _silver(spark, tmp_path)
    # mock candles span 09:15-15:30 IST (2024-01-01 is a Monday) -> all kept
    assert trading_hours_only(silver).count() == silver.count()
    # shift by 12 hours -> outside the session, everything drops
    shifted = silver.withColumn(
        "timestamp_iso", F.col("timestamp_iso") + F.expr("INTERVAL 12 HOURS")
    )
    assert trading_hours_only(shifted).count() == 0
