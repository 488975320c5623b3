"""Custom stateful streaming operator: running VWAP state must survive
micro-batch boundaries (maxFilesPerTrigger=1 forces one batch per file)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.plans.etl import (
    bronze_to_silver,
)
from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.schemas import (
    RAW_ENVELOPE_SCHEMA,
)
from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.streaming.stateful import (
    streaming_vwap,
)

# two files = two micro-batches; candles [ts, o, h, l, close, volume]
BATCH1 = [[1704099300.0, 10, 11, 9, 10.0, 100.0], [1704099600.0, 10, 11, 9, 20.0, 100.0]]
BATCH2 = [[1704099900.0, 10, 11, 9, 40.0, 200.0]]


def _envelope(candles):
    return {
        "data": {
            "NSE:X-EQ": {"symbol": "NSE:X-EQ", "resolution": "5", "candles": candles}
        }
    }


def test_vwap_state_survives_batches(spark, tmp_path):
    import os
    import time

    raw = tmp_path / "raw"
    raw.mkdir()
    f1, f2 = raw / "a_batch1.json", raw / "b_batch2.json"
    f1.write_text(json.dumps(_envelope(BATCH1)))
    f2.write_text(json.dumps(_envelope(BATCH2)))
    # the file source orders batches by modification time, not name
    now = time.time()
    os.utime(f1, (now - 60, now - 60))
    os.utime(f2, (now, now))

    stream = (
        spark.readStream.schema(RAW_ENVELOPE_SCHEMA)
        .option("multiLine", "true")
        .option("maxFilesPerTrigger", 1)
        .json(str(raw))
    )
    vwap = streaming_vwap(bronze_to_silver(stream, dedup=None))
    q = (
        vwap.writeStream.format("memory")
        .queryName("vwap_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        r["timestamp_unix"]: r
        for r in spark.sql("SELECT * FROM vwap_out").collect()
    }
    assert len(rows) == 3
    assert rows[1704099300]["vwap"] == 10.0                      # 1000/100
    assert rows[1704099600]["vwap"] == 15.0                      # 3000/200
    # batch 2 continues from batch 1's state: (3000 + 8000) / 400
    assert rows[1704099900]["vwap"] == 27.5
    assert rows[1704099900]["cum_volume"] == 400
