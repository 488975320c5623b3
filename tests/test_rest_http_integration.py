"""REST source integration test over real sockets: a live in-process
http.server plays the quote API, so retry, backoff, circuit-breaker trip,
and recovery run through actual HTTP — no injected fake
(reference semantics: ingestion/lambda_ingestion.py:292-456,
ingestion/ingestion.py:30-282)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.sources.rest import (
    CircuitBreaker,
    RestPollSource,
    http_json_transport,
)

CANDLES = [[1700000000, 10.0, 11.0, 9.5, 10.5, 1000.0]]


class _QuoteHandler(BaseHTTPRequestHandler):
    """GOOD -> 200; FLAKY -> 500 twice then 200; DEAD -> always 500."""

    hits: dict[str, int] = {}
    lock = threading.Lock()

    def do_GET(self):  # noqa: N802 (http.server API)
        sym = parse_qs(urlparse(self.path).query).get("symbol", ["?"])[0]
        with self.lock:
            self.hits[sym] = self.hits.get(sym, 0) + 1
            n = self.hits[sym]
        if sym == "DEAD" or (sym == "FLAKY" and n <= 2):
            self.send_error(500, "boom")
            return
        body = json.dumps({"candles": CANDLES}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):  # silence per-request stderr noise
        pass


@pytest.fixture()
def quote_server():
    _QuoteHandler.hits = {}
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _QuoteHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()
    srv.server_close()


def test_retry_recovers_over_real_http(quote_server):
    src = RestPollSource(
        transport=http_json_transport(quote_server), backoff_base_s=0.001
    )
    env = src.fetch_envelope(["GOOD", "FLAKY"], fetch_ts="2024-01-01T00:00:00Z")
    assert env["data"]["GOOD"]["candles"] == CANDLES
    # FLAKY needed the full retry budget: two 500s then success
    assert env["data"]["FLAKY"]["candles"] == CANDLES
    assert _QuoteHandler.hits["FLAKY"] == 3
    assert env["metadata"]["success_rate_percent"] == "100.0"


def test_breaker_trips_and_half_open_recovers(quote_server):
    clock = {"t": 0.0}
    breaker = CircuitBreaker(threshold=3, cooldown_s=60.0, clock=lambda: clock["t"])
    src = RestPollSource(
        transport=http_json_transport(quote_server),
        backoff_base_s=0.001,
        breaker=breaker,
    )
    env = src.fetch_envelope(["DEAD", "GOOD"], fetch_ts="t0")
    # DEAD burned its 3 retries -> breaker OPEN -> GOOD never even dialed
    assert env["metadata"]["failed_symbols"] == "2"
    assert "GOOD" not in _QuoteHandler.hits
    assert breaker.state == "OPEN"
    # cooldown elapses -> HALF_OPEN -> one success re-closes over real HTTP
    clock["t"] += 61.0
    assert breaker.state == "HALF_OPEN"
    env2 = src.fetch_envelope(["GOOD"], fetch_ts="t1")
    assert env2["data"]["GOOD"]["candles"] == CANDLES
    assert breaker.state == "CLOSED"


def test_envelope_to_dataframe_over_real_http(quote_server, spark):
    src = RestPollSource(transport=http_json_transport(quote_server))
    df = src.to_dataframe(spark, ["GOOD"], fetch_ts="2024-01-01T00:00:00Z")
    row = df.collect()[0]
    assert row["data"]["GOOD"]["candles"][0][4] == 10.5
    assert row["metadata"]["successful_symbols"] == "1"
