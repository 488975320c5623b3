"""Loaders for the driver's synthetic parquet tables (TESTDATA.md).

Plain ``spark.read.parquet`` — schema comes from parquet footers, filters
and projections push down into the scan. At 100 TB these would be
partitioned/bucketed tables behind a catalog; the API is the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Timestamp columns stored as parquet TIMESTAMP(NANOS), which Spark cannot
#: map to TimestampType natively. We read them as raw nanos longs
#: (spark.sql.legacy.parquet.nanosAsLong) and convert with exact integer
#: division — double division would lose precision at 1e18 ns epochs.
#: DuckDB truncates ns->us the same way, so both engines see identical
#: microsecond timestamps.
NANOS_TS_COLS: dict[str, tuple[str, ...]] = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ts_cols = NANOS_TS_COLS.get(name, ())
    if ts_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in ts_cols:
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> None:
    """Register each table as a temp view for the spark.sql surface."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
