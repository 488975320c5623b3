"""Bucketed tables: shuffle-free co-located joins and aggregations.

At 100 TB the dominant cost of fact-fact joins and repeated per-key
aggregation is the shuffle. Bucketing (hash-clustering files by key at
write time, registered in the catalog) lets Catalyst plan SortMergeJoin
with NO Exchange on either side when both tables are bucketed on the join
key with compatible bucket counts — the classic warehouse layout for a
candle store keyed by symbol.

Spark requires ``saveAsTable`` (catalog-registered) for bucketing;
path-only parquet cannot carry bucket metadata.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a catalog table bucketed (and optionally sorted) by key.

    Sorting within buckets additionally removes the Sort from
    SortMergeJoin and makes per-key window scans sequential I/O."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
