"""ORC source/sink — the second columnar format next to parquet.

The reference stores everything as CSV.gz/parquet on S3 (etl/
lightweight_etl.py); warehouse users routinely need ORC for Hive/Trino
interop, and Spark ships the reader/writer built-in (no extra jars —
unlike Avro, whose external module is not in this image). Same scan
properties as parquet: column pruning, predicate pushdown into stripe/
row-group indexes, optional bloom filters per column.

100 TB notes: ORC stripes are the parallelism unit (like parquet
row-groups) — `spark.sql.files.maxPartitionBytes` splits scans the same
way; dictionary + zstd keeps scan bytes comparable to parquet; pushdown
is on by default (`spark.sql.orc.filterPushdown`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    compression: str = "zstd",
    bloom_columns: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ORC. ``bloom_columns`` adds per-column bloom
    filters (point-lookup pushdown on high-cardinality keys — the ORC
    twin of a parquet column index)."""
    w = df.write.mode(mode).option("compression", compression)
    if bloom_columns:
        w = w.option("orc.bloom.filter.columns", ",".join(bloom_columns))
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read an ORC dataset (schema from the file footer; partition
    columns discovered from the directory layout)."""
    return spark.read.orc(path)
