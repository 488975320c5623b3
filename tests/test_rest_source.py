"""REST poll connector: retry/backoff, circuit breaker, envelope shape,
and the DataFrame hand-off into the ETL plan — all against a fake
transport (no network)."""

from __future__ import annotations

import pytest

from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.plans.etl import (
    bronze_to_silver,
)
from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.sources.rest import (
    CircuitBreaker,
    CircuitOpenError,
    RestPollSource,
)

CANDLES = [[1704099300.0, 100.0, 101.0, 99.0, 100.5, 1000.0],
           [1704099600.0, 100.5, 102.0, 100.0, 101.5, 1500.0]]


def test_fetch_retries_then_succeeds():
    calls = []

    def flaky(symbol, params):
        calls.append(symbol)
        if len(calls) < 3:
            raise ConnectionError("boom")
        return CANDLES

    src = RestPollSource(transport=flaky, retries=3, sleep=lambda s: None)
    env = src.fetch_envelope(["NSE:RELIANCE-EQ"], fetch_ts="t0")
    assert len(calls) == 3
    assert env["metadata"]["success_rate_percent"] == "100.0"
    assert env["data"]["NSE:RELIANCE-EQ"]["candles"] == CANDLES


def test_failures_reported_not_raised():
    def dead(symbol, params):
        raise ConnectionError("down")

    src = RestPollSource(
        transport=dead, retries=2, sleep=lambda s: None,
        breaker=CircuitBreaker(threshold=100),
    )
    env = src.fetch_envelope(["A", "B"], fetch_ts="t0")
    assert env["data"] == {}
    assert env["metadata"]["failed_symbols"] == "2"
    assert env["metadata"]["success_rate_percent"] == "0.0"


def test_circuit_breaker_opens_and_recovers():
    t = [0.0]
    br = CircuitBreaker(threshold=2, cooldown_s=60, clock=lambda: t[0])

    def dead(symbol, params):
        raise ConnectionError("down")

    src = RestPollSource(transport=dead, retries=2, sleep=lambda s: None, breaker=br)
    assert src.fetch_symbol("A", {}) is None  # 2 failures -> OPEN
    assert br.state == "OPEN"
    with pytest.raises(CircuitOpenError):
        src.fetch_symbol("A", {})
    t[0] = 61.0  # cooldown elapsed -> HALF_OPEN probe allowed
    assert br.state == "HALF_OPEN"
    src.transport = lambda s, p: CANDLES
    assert src.fetch_symbol("A", {}) == CANDLES
    assert br.state == "CLOSED"


def test_envelope_to_silver(spark):
    src = RestPollSource(transport=lambda s, p: CANDLES)
    df = src.to_dataframe(spark, ["NSE:RELIANCE-EQ", "NSE:TCS-EQ"], fetch_ts="t0")
    silver = bronze_to_silver(df, dedup=None)
    rows = silver.collect()
    assert len(rows) == 4  # 2 symbols x 2 candles
    assert {r["symbol_clean"] for r in rows} == {"RELIANCE", "TCS"}
    assert all(r["high"] >= r["low"] for r in rows)
