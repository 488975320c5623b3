"""Scalar function + close-only normalization tests (F1-F14, P9/P10)."""

from __future__ import annotations

from pyspark.sql import functions as F

from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.functions.candles import (
    clean_symbol,
    epoch_any_unit,
    normalize_symbol,
    price_change_cols,
)
from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.functions.timeparse import (
    interval_to_minutes,
    period_to_timedelta,
)
from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.plans.close_only import (
    normalize_close_only,
)


def test_symbol_cleaning_and_normalization(spark):
    df = spark.createDataFrame(
        [("NSE:RELIANCE-EQ",), ("reliance",), (" tcs ",), ("NSE:INFY-EQ",),
         ("BSE:X",), ("hdfc-eq",)],
        "symbol string",
    )
    out = df.select(
        clean_symbol("symbol").alias("clean"),
        normalize_symbol("symbol").alias("norm"),
    ).collect()
    assert [r["clean"] for r in out[:4]] == ["RELIANCE", "reliance", " tcs ", "INFY"]
    assert out[1]["norm"] == "NSE:RELIANCE-EQ"
    assert out[2]["norm"] == "NSE:TCS-EQ"
    assert out[0]["norm"] == "NSE:RELIANCE-EQ"  # already canonical
    # exchange-qualified without -EQ passes through UNCHANGED (reference
    # api_handler falls through without appending)
    assert out[4]["norm"] == "BSE:X"
    # bare name that already carries -EQ only gains the prefix
    assert out[5]["norm"] == "NSE:HDFC-EQ"


def test_period_and_interval_tokens():
    # the reference's 30d/365d approximations, not calendar months
    assert period_to_timedelta("3m").days == 90
    assert period_to_timedelta("2y").days == 730
    assert period_to_timedelta("30d").days == 30
    assert period_to_timedelta("garbage").days == 30  # documented fallback
    assert interval_to_minutes("5m") == 5
    assert interval_to_minutes("1h") == 60
    assert interval_to_minutes("1d") == 1440
    assert interval_to_minutes("??", default=5) == 5
    # bare numeric tokens: days for periods, minutes for intervals
    # (reference fallback branches)
    assert period_to_timedelta("45").days == 45
    assert interval_to_minutes("15") == 15
    # reference edge semantics (api/api_handler.py:745-785): a bare unit
    # token is value 0; a malformed interval raises (no silent default)
    assert period_to_timedelta("d").days == 0
    assert period_to_timedelta("y").days == 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        interval_to_minutes("??")


def test_epoch_unit_heuristic(spark):
    df = spark.createDataFrame(
        [(1700000000.0,), (1700000000000.0,)], "ts double"
    )
    out = df.select(epoch_any_unit("ts").alias("t")).collect()
    assert out[0]["t"] == out[1]["t"]  # seconds and millis converge


def test_price_change_guards_zero_open(spark):
    df = spark.createDataFrame(
        [(0.0, 10.0, 12.0, 8.0), (10.0, 11.0, 12.0, 9.0)],
        "open double, close double, high double, low double",
    )
    out = price_change_cols(df).collect()
    assert out[0]["price_change_percent"] == 0.0  # guarded, not NaN/error
    assert abs(out[1]["price_change_percent"] - 10.0) < 1e-12


def test_close_only_alias_coalescing(spark):
    rows = [
        # canonical names, epoch seconds
        {"symbol": "A", "timestamp": "1700000000", "close": "10.5", "volume": "7"},
        # alias names, epoch millis
        {"s": "B", "ts": "1700000000000", "c": "11.5"},
        # ticker + ISO string + last
        {"ticker": "C", "time": "2024-01-01T09:15:00", "last": "12.5", "v": "3"},
        # missing close -> dropped
        {"symbol": "D", "timestamp": "1700000000"},
    ]
    import json

    df = spark.read.json(spark.sparkContext.parallelize([json.dumps(r) for r in rows]))
    out = {r["symbol"]: r for r in normalize_close_only(df).collect()}
    assert set(out) == {"A", "B", "C"}
    assert out["A"]["close"] == 10.5 and out["A"]["volume"] == 7
    assert out["A"]["timestamp"] == out["B"]["timestamp"]  # s == ms epoch
    assert out["B"]["volume"] == 0  # defaulted
    assert out["C"]["year"] == 2024 and out["C"]["month"] == 1


class TestBenfordDigits:
    def test_probabilities_and_mass_balance(self, spark, sf_dir):
        """The report's invariants: benford_p sums to exactly 1.0 (the
        quantized constants sum to 1e6 by construction), shares sum to
        1.0 over the observed digits, every digit is 1-9."""
        import __spark_entry__ as E

        rows = E.e_benford_digits(spark, sf_dir).collect()
        assert all(1 <= r["digit"] <= 9 for r in rows)
        assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-12
        total = sum(r["n"] for r in rows)
        for r in rows:
            assert r["share"] == r["n"] / total
            assert r["abs_dev"] == abs(r["share"] - r["benford_p"])
        from __spark_entry__ import _BENFORD_P6

        assert sum(_BENFORD_P6) == 1_000_000
