"""The consumption-layer dashboard example (examples/dashboard.py): real
HTTP round trip against the engine-backed handlers — the reference's
scripts/dashboard.py routes (/, /api/data, /files, /file/<key>) served
from a raw envelope directory."""

from __future__ import annotations

import json
import sys
import threading
import urllib.request
from http.server import ThreadingHTTPServer
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))


def test_dashboard_routes_end_to_end(spark, tmp_path):
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.sources.mock import (
        write_mock_envelope_files,
    )
    from dashboard import _engine, make_handler

    data_dir = str(tmp_path / "raw")
    (tmp_path / "raw").mkdir()
    write_mock_envelope_files(
        spark, data_dir, ["NSE:AAA-EQ", "NSE:BBB-EQ"], fetches=2
    )

    list_files, latest_snapshot, file_detail = _engine(data_dir)
    srv = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(list_files, latest_snapshot, file_detail)
    )
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        api = json.loads(
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/api/data", timeout=120
            ).read()
        )
        assert {r["symbol"] for r in api} == {"NSE:AAA-EQ", "NSE:BBB-EQ"}
        for r in api:
            assert r["change"] == round(r["close"] - r["open"], 2)

        home = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=120
        ).read().decode()
        assert "NSE:AAA-EQ" in home and "Latest snapshot" in home

        files_page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/files", timeout=120
        ).read().decode()
        assert "raw_file_20240101_01.json" in files_page

        detail = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/file/raw_file_20240101_00.json",
            timeout=120,
        ).read().decode()
        assert "NSE:BBB-EQ" in detail and "n_candles" in detail

        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/nope", timeout=120)
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.shutdown()
