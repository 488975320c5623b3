"""SparkSession factory and tuning.

Scale notes (100 TB design): every conf here is cluster-safe. AQE handles
runtime partition coalescing and skew-join splitting; dynamic partition
overwrite gives idempotent day-partition rewrites (the reference's
"can be run multiple times safely" contract, README.md:113); UTC session
timezone pins epoch<->timestamp semantics (the reference's naive
``datetime.fromtimestamp`` is a documented parity trap, SURVEY.md SS7.2).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Confs that are safe (and desirable) to set on an already-running session.
RUNTIME_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    "spark.sql.parquet.compression.codec": "snappy",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def _cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def tune(spark: SparkSession, shuffle_partitions: int | None = None) -> SparkSession:
    """Apply runtime confs to an externally-created session (e.g. the
    verification driver's). Only touches confs settable post-start."""
    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - conf locked by the host
            pass
    n = shuffle_partitions or _cpus()
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
    except Exception:  # pragma: no cover
        pass
    return spark


def get_spark(
    app_name: str = "ohlcv-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a tuned SparkSession.

    Local default is ``local[$SPARK_GRAFT_CPUS]``; on a real cluster pass
    ``master=None`` with spark-submit supplying the master. Shuffle
    partitions default to core count locally — at cluster scale set this
    (or rely on AQE coalescing) to target ~128 MB per shuffle partition.
    """
    cpus = _cpus()
    builder = SparkSession.builder.appName(app_name).master(
        master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    )
    conf = dict(RUNTIME_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions or cpus)
    conf.setdefault("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    conf.setdefault("spark.ui.enabled", "false")
    conf.setdefault("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    for k, v in (extra or {}).items():
        conf[k] = v
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return tune(spark, shuffle_partitions)
