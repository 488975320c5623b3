"""REST poll source (SURVEY.md S1, ST7): the broker-API ingestion
connector re-expressed for Spark.

The reference polls a quote API per symbol with retry + token refresh
(ingestion/lambda_ingestion.py:292-456) and, in the container variant,
a circuit breaker (CLOSED/OPEN/HALF_OPEN, threshold + cooldown), jittered
exponential backoff, and batch-of-N pacing (ingestion/ingestion.py:30-282).

Architecture: fetching is a DRIVER-side connector concern (symbol lists
are small; candle payloads are what scale) — the fetched envelope becomes
a DataFrame via ``spark.createDataFrame`` with the canonical schema and
flows into the same bronze->silver plan as file ingest. The transport is
injected, so tests run against a fake; no network access is assumed here.
Determinism: backoff jitter derives from md5 of (symbol, attempt), not a
random source.
"""

from __future__ import annotations

import hashlib
import time as _time
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..schemas import RAW_ENVELOPE_SCHEMA

#: transport(symbol, params) -> candle rows [[ts, o, h, l, c, v], ...]
Transport = Callable[[str, dict], list[list[float]]]


class CircuitOpenError(RuntimeError):
    pass


def http_json_transport(base_url: str, timeout_s: float = 10.0) -> Transport:
    """Real-HTTP transport (stdlib urllib): GET
    ``{base_url}/quote?symbol=...&<params>`` expecting JSON
    ``{"candles": [[ts, o, h, l, c, v], ...]}`` — the quote-API shape the
    reference polls (ingestion/lambda_ingestion.py:292-340). Non-2xx and
    socket errors raise, which RestPollSource turns into retries/breaker
    trips. Exercised against a live local server in
    tests/test_rest_http_integration.py."""
    import json
    from urllib.parse import urlencode
    from urllib.request import urlopen

    def transport(symbol: str, params: dict) -> list[list[float]]:
        q = urlencode({"symbol": symbol, **params})
        with urlopen(f"{base_url}/quote?{q}", timeout=timeout_s) as resp:
            return json.loads(resp.read().decode("utf-8"))["candles"]

    return transport


@dataclass
class CircuitBreaker:
    """CLOSED -> OPEN after ``threshold`` consecutive failures; OPEN ->
    HALF_OPEN after ``cooldown_s``; one HALF_OPEN success re-closes
    (ingestion/ingestion.py:30-66 semantics)."""

    threshold: int = 3
    cooldown_s: float = 60.0
    clock: Callable[[], float] = _time.monotonic
    failures: int = 0
    opened_at: float | None = None

    @property
    def state(self) -> str:
        if self.opened_at is None:
            return "CLOSED"
        if self.clock() - self.opened_at >= self.cooldown_s:
            return "HALF_OPEN"
        return "OPEN"

    def before_call(self) -> None:
        if self.state == "OPEN":
            raise CircuitOpenError("circuit open; refusing call")

    def record(self, ok: bool) -> None:
        if ok:
            self.failures = 0
            self.opened_at = None
        else:
            self.failures += 1
            if self.failures >= self.threshold:
                self.opened_at = self.clock()


def _deterministic_jitter(symbol: str, attempt: int) -> float:
    h = hashlib.md5(f"{symbol}:{attempt}".encode()).hexdigest()[:4]
    return int(h, 16) / 0xFFFF  # [0, 1]


@dataclass
class RestPollSource:
    """Per-symbol fetch with bounded retries, deterministic jittered
    exponential backoff, rate-limit pacing, and a shared circuit breaker.
    Produces the raw ingestion envelope dict (FIXTURES.md SS1)."""

    transport: Transport
    retries: int = 3
    backoff_base_s: float = 0.5
    rate_limit_s: float = 0.0
    breaker: CircuitBreaker = field(default_factory=CircuitBreaker)
    sleep: Callable[[float], None] = _time.sleep

    def fetch_symbol(self, symbol: str, params: dict) -> list[list[float]] | None:
        for attempt in range(self.retries):
            self.breaker.before_call()
            try:
                rows = self.transport(symbol, params)
                self.breaker.record(True)
                return rows
            except CircuitOpenError:
                raise
            except Exception:  # noqa: BLE001 — any transport error retries
                self.breaker.record(False)
                if attempt + 1 < self.retries:
                    self.sleep(
                        self.backoff_base_s
                        * (2**attempt)
                        * (1 + _deterministic_jitter(symbol, attempt))
                    )
        return None

    def fetch_envelope(
        self, symbols: Sequence[str], params: dict | None = None,
        resolution: str = "5", fetch_ts: str = "",
    ) -> dict:
        params = params or {}
        data, failed = {}, []
        for i, sym in enumerate(symbols):
            if self.rate_limit_s and i:
                self.sleep(self.rate_limit_s)
            try:
                rows = self.fetch_symbol(sym, params)
            except CircuitOpenError:
                failed.append(sym)
                continue
            if rows is None:
                failed.append(sym)
                continue
            data[sym] = {
                "symbol": sym,
                "resolution": resolution,
                "candles": [[float(x) for x in r] for r in rows],
                "timestamp": fetch_ts,
                "metadata": {},
            }
        total = len(symbols)
        ok = total - len(failed)
        return {
            "data": data,
            "metadata": {
                "total_symbols_requested": str(total),
                "successful_symbols": str(ok),
                "failed_symbols": str(len(failed)),
                # A13 success-rate metric (ingestion/lambda_ingestion.py:436-445)
                "success_rate_percent": str(round(ok / total * 100, 2) if total else 0.0),
                "ingestion_timestamp": fetch_ts,
                "resolution": resolution,
            },
        }

    def to_dataframe(
        self, spark: SparkSession, symbols: Sequence[str], **kw
    ) -> DataFrame:
        """One fetch cycle -> a single-row envelope DataFrame with the
        canonical nested schema, ready for plans.etl.bronze_to_silver."""
        env = self.fetch_envelope(symbols, **kw)
        return spark.createDataFrame([env], RAW_ENVELOPE_SCHEMA)
