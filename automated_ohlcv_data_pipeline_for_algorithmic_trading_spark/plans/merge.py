"""Partition-scoped MERGE upsert for plain-parquet tables.

The reference's idempotent re-run contract (README.md:113,
etl/lightweight_etl.py:281-282: re-processing a day must not duplicate
rows) is usually met with a lakehouse MERGE INTO. Delta/Iceberg jars are
not in this image, so this module implements the same row-level contract
on plain partitioned parquet, Spark-first:

1. collect the update batch's DISTINCT partition tuples (driver-side;
   bounded by partitions touched per batch, never by rows);
2. read the target pruned to those partitions (partition filters reach
   the scan — nothing outside the touched partitions is even listed);
3. anti-join out target rows whose merge key appears in the update batch
   (WHEN MATCHED -> UPDATE) and union the batch (WHEN NOT MATCHED ->
   INSERT); within the batch, last-wins on an explicit order column;
4. dynamic-partition-overwrite ONLY the touched partitions.

Write atomicity matches dynamic partition overwrite (per-partition
directory swap on job commit) — the same guarantee every non-lakehouse
Spark deployment relies on; swap step 4 for ``MERGE INTO`` when a table
format with a transaction log is available.

At 100 TB the cost model holds: a daily batch touches (symbols x 1 day)
partitions; the rewrite is proportional to the touched data, not the
table. The anti join shuffles only the touched partitions' rows against
the batch keys (broadcast when the batch is small).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import dedup_by_key


#: Above this many touched partition tuples the plan switches from a
#: literal OR-chain filter (statically pruned at planning time) to a
#: broadcast tuple semi-join (runtime dynamic partition pruning): the
#: OR-chain's plan size grows linearly with touched partitions, so a
#: backfill touching thousands of (symbol, day) tuples would bloat
#: planning/codegen while the semi-join plan stays constant-size.
MERGE_PARTITION_LITERAL_MAX = 64


def merge_into_parquet(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    keys: Sequence[str],
    partition_cols: Sequence[str],
    order_col: str | Sequence[str] | None = None,
    write_parallelism: int | None = None,
    literal_partition_max: int = MERGE_PARTITION_LITERAL_MAX,
) -> None:
    """Upsert ``updates`` into the partitioned parquet table at
    ``target_path``: rows whose ``keys`` match an existing row replace it,
    new keys append; only partitions present in ``updates`` are rewritten.

    ``order_col``: explicit within-batch arrival order — when one batch
    carries several rows per key, the LAST by this order wins (mirrors
    bronze_to_silver's dedup discipline). ``partition_cols`` must be the
    table's physical partitioning; every update row must carry them.
    """
    keys = list(keys)
    partition_cols = list(partition_cols)
    touched_df = updates.select(*partition_cols).distinct()
    # collect at most threshold+1 tuples: enough to know which pruning
    # strategy applies without ever pulling an unbounded backfill's
    # partition list onto the driver
    touched = touched_df.limit(literal_partition_max + 1).collect()
    if order_col is not None:
        updates = dedup_by_key(updates, keys, order_col, keep="last")

    try:
        target = spark.read.parquet(target_path)
    except Exception:
        target = None  # first load: plain insert
    if target is not None and touched:
        if len(touched) <= literal_partition_max:
            part_filter = F.lit(False)
            for row in touched:
                clause = F.lit(True)
                for c in partition_cols:
                    clause = clause & (F.col(c) == F.lit(row[c]))
                part_filter = part_filter | clause
            existing = target.filter(part_filter)
        else:
            # many-partition batch: broadcast semi-join on the partition
            # tuple — constant-size plan; the join is on the scan's raw
            # partition columns (build side cast to the target's inferred
            # types) so dynamic partition pruning still skips untouched
            # directories at runtime
            build = touched_df
            for c in partition_cols:
                build = build.withColumn(
                    c, F.col(c).cast(target.schema[c].dataType)
                )
            existing = target.join(F.broadcast(build), partition_cols, "left_semi")
        # partition-column type inference may read dt=2024-01-01 back as
        # DATE; align to the update batch's declared types so the union
        # and the rewritten files stay schema-stable
        for c in partition_cols:
            existing = existing.withColumn(
                c, F.col(c).cast(updates.schema[c].dataType)
            )
        # WHEN MATCHED -> the update replaces the target row
        keep = existing.join(
            F.broadcast(updates.select(*keys).distinct()), keys, "left_anti"
        )
        merged = keep.unionByName(updates.select(*keep.columns))
        # the write overwrites files this plan reads: materialize the
        # merged rows FIRST (bounded by the touched partitions), or Spark
        # rejects / corrupts the self-referential overwrite
        merged = merged.localCheckpoint()
    else:
        merged = updates

    n = write_parallelism or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    out = merged.repartition(n, *[F.col(c) for c in partition_cols])
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .option("compression", "snappy")
        .parquet(target_path)
    )
