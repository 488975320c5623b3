"""Robustness: corrupt bronze files must degrade, not fail (PERMISSIVE +
_corrupt_record), and the ETL must be resilient to partial envelopes."""

from __future__ import annotations

from pyspark.sql import functions as F

from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.plans.etl import (
    bronze_to_silver,
)
from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.sources.mock import (
    write_mock_envelope_files,
)
from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.sources.raw_json import (
    read_raw_envelopes,
)


def test_corrupt_file_does_not_kill_the_batch(spark, tmp_path):
    raw_dir = tmp_path / "raw"
    raw_dir.mkdir()
    write_mock_envelope_files(spark, str(raw_dir), ["NSE:RELIANCE-EQ"], days=1, fetches=1)
    (raw_dir / "raw_file_garbage.json").write_text("{this is not json!!!")
    # Spark refuses to query only the corrupt-record column of an
    # un-materialized JSON scan; cache first (the documented pattern)
    raw = read_raw_envelopes(spark, str(raw_dir)).cache()
    corrupt = raw.filter(F.col("_corrupt_record").isNotNull())
    assert corrupt.count() == 1  # visible, quarantined
    good = raw.filter(F.col("_corrupt_record").isNull())
    assert bronze_to_silver(good, dedup="last").count() == 75


def test_partial_envelope_missing_fields(spark, tmp_path):
    """Envelopes with missing optional struct fields (no metadata, no
    fetch timestamp) still normalize; candles with too few elements
    produce nulls that the DQ filter drops."""
    import json

    raw_dir = tmp_path / "raw2"
    raw_dir.mkdir()
    env = {
        "data": {
            "NSE:X-EQ": {
                "symbol": "NSE:X-EQ",
                "candles": [
                    [1704099300.0, 10.0, 11.0, 9.0, 10.5, 100.0],  # good
                    [1704099600.0, 10.0],  # truncated -> nulls -> dropped
                ],
            }
        }
    }
    (raw_dir / "raw_file_1.json").write_text(json.dumps(env))
    raw = read_raw_envelopes(spark, str(raw_dir))
    out = bronze_to_silver(raw, dedup=None).collect()
    assert len(out) == 1
    assert out[0]["close"] == 10.5
    assert out[0]["resolution"] is None  # missing optional field flows as null
