"""Consumption-layer dashboard — the reference's Flask/S3 dashboard
(scripts/dashboard.py:1-320: list recent raw files, show the latest
per-symbol OHLCV snapshot with change/percent, JSON API, per-file detail)
re-expressed against this engine: the raw zone is a directory of envelope
JSON files (local or any Hadoop-visible path), the queries are the
engine's own plans (read_raw_envelopes -> latest_file_only -> explode ->
latest candle per symbol), and the server is the standard library — no
Flask/boto3 required.

Routes (mirroring the reference):
  /            latest per-symbol snapshot table + recent files
  /api/data    the same snapshot as JSON
  /files       all raw files with size/mtime
  /file/NAME   per-symbol candle counts inside one raw file

Run: python examples/dashboard.py [--data-dir DIR] [--port 8050]
Without --data-dir it seeds a temp raw zone with the mock generator.
This is a demo client, not a data path: queries run per request on the
driver and results are small (one row per symbol).
"""

from __future__ import annotations

import argparse
import html
import json
import os
import sys
import tempfile
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from urllib.parse import unquote, urlparse

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def _engine(data_dir: str):
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark import get_spark
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.plans.etl import (
        explode_envelopes,
    )
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.sources.raw_json import (
        latest_file_only,
        read_raw_envelopes,
    )

    spark = get_spark("ohlcv-dashboard")

    def list_files():
        out = []
        for name in sorted(os.listdir(data_dir), reverse=True):
            if name.endswith(".json"):
                p = os.path.join(data_dir, name)
                st = os.stat(p)
                out.append(
                    {"key": name, "size": st.st_size, "modified": st.st_mtime}
                )
        return out

    def latest_snapshot():
        """Latest candle per symbol from the newest raw file, with the
        reference's change/change_percent derivation."""
        raw = read_raw_envelopes(spark, f"{data_dir}/*.json")
        flat = explode_envelopes(latest_file_only(raw))
        last = (
            flat.groupBy("symbol")
            .agg(
                F.max_by(
                    F.struct("open", "high", "low", "close", "volume"),
                    F.col("timestamp_unix"),
                ).alias("c")
            )
            .select(
                "symbol",
                F.round("c.open", 2).alias("open"),
                F.round("c.high", 2).alias("high"),
                F.round("c.low", 2).alias("low"),
                F.round("c.close", 2).alias("close"),
                F.col("c.volume").cast("long").alias("volume"),
                F.round(F.col("c.close") - F.col("c.open"), 2).alias("change"),
                F.when(
                    F.col("c.open") > 0,
                    F.round(
                        (F.col("c.close") - F.col("c.open")) / F.col("c.open") * 100,
                        2,
                    ),
                )
                .otherwise(F.lit(0.0))
                .alias("change_percent"),
            )
            .orderBy("symbol")
        )
        return [r.asDict() for r in last.collect()]

    def file_detail(name: str):
        raw = read_raw_envelopes(spark, os.path.join(data_dir, name))
        flat = explode_envelopes(raw)
        rows = (
            flat.groupBy("symbol")
            .agg(
                F.count(F.lit(1)).alias("n_candles"),
                F.min("timestamp_unix").alias("first_ts"),
                F.max("timestamp_unix").alias("last_ts"),
            )
            .orderBy("symbol")
            .collect()
        )
        return [r.asDict() for r in rows]

    return list_files, latest_snapshot, file_detail


def _table(rows: list[dict]) -> str:
    if not rows:
        return "<p>No data.</p>"
    cols = list(rows[0])
    head = "".join(f"<th>{html.escape(str(c))}</th>" for c in cols)
    body = "".join(
        "<tr>" + "".join(f"<td>{html.escape(str(r[c]))}</td>" for c in cols) + "</tr>"
        for r in rows
    )
    return f"<table border=1 cellpadding=4><tr>{head}</tr>{body}</table>"


def make_handler(list_files, latest_snapshot, file_detail):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, body: str, ctype: str = "text/html", code: int = 200):
            data = body.encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", f"{ctype}; charset=utf-8")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):  # noqa: N802
            path = urlparse(self.path).path
            try:
                if path == "/":
                    snap = latest_snapshot()
                    files = list_files()[:5]
                    self._send(
                        "<h1>OHLCV dashboard</h1>"
                        f"<h2>Latest snapshot ({len(snap)} symbols)</h2>"
                        + _table(snap)
                        + "<h2>Recent raw files</h2>"
                        + _table(files)
                        + '<p><a href="/files">all files</a> | '
                        '<a href="/api/data">JSON API</a></p>'
                    )
                elif path == "/api/data":
                    self._send(json.dumps(latest_snapshot()), "application/json")
                elif path == "/files":
                    self._send("<h1>Raw files</h1>" + _table(list_files()))
                elif path.startswith("/file/"):
                    name = os.path.basename(unquote(path[len("/file/"):]))
                    self._send(
                        f"<h1>{html.escape(name)}</h1>" + _table(file_detail(name))
                    )
                else:
                    self._send("not found", code=404)
            except Exception as e:  # demo server: surface, don't crash
                self._send(f"<pre>{html.escape(str(e))}</pre>", code=500)

        def log_message(self, fmt, *args):  # quiet
            pass

    return Handler


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--port", type=int, default=8050)
    ap.add_argument("--once", action="store_true", help="render / once and exit")
    args = ap.parse_args()

    data_dir = args.data_dir
    if data_dir is None:
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark import (
            get_spark,
        )
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.sources.mock import (
            write_mock_envelope_files,
        )

        data_dir = tempfile.mkdtemp(prefix="dashboard_raw_")
        write_mock_envelope_files(
            get_spark("ohlcv-dashboard"),
            data_dir,
            [f"NSE:SYM{i:02d}-EQ" for i in range(8)],
            fetches=2,
        )
        print(f"seeded mock raw zone: {data_dir}")

    list_files, latest_snapshot, file_detail = _engine(data_dir)
    if args.once:
        print(json.dumps(latest_snapshot(), indent=2)[:2000])
        print(f"{len(list_files())} raw files")
        return
    srv = ThreadingHTTPServer(
        ("127.0.0.1", args.port),
        make_handler(list_files, latest_snapshot, file_detail),
    )
    print(f"dashboard: http://127.0.0.1:{args.port}/")
    srv.serve_forever()


if __name__ == "__main__":
    main()
