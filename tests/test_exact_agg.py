"""The determinism contract: decimal-routed aggregates are bit-identical
across partitionings (the property the DuckDB oracle comparison relies on,
and the property that keeps checksums stable across cluster topologies)."""

from __future__ import annotations

from pyspark.sql import functions as F

from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.functions.exact import (
    davg,
    dstddev,
    dsum,
)


def test_dsum_partition_invariant(spark):
    df = spark.range(0, 100_000).withColumn(
        "v", (F.col("id") % 997).cast("double") * 0.01 + 0.07
    )
    a = df.repartition(1).agg(dsum("v", "s")).collect()[0]["s"]
    b = df.repartition(32).agg(dsum("v", "s")).collect()[0]["s"]
    c = df.repartition(7, "id").agg(dsum("v", "s")).collect()[0]["s"]
    assert a == b == c  # bit-identical, not approx


def test_davg_dstddev_match_python(spark):
    import statistics

    vals = [round(x * 0.37 + 1.0, 2) for x in range(1, 2001)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    row = df.agg(davg("v", "m"), dstddev("v", "s")).collect()[0]
    assert abs(row["m"] - statistics.fmean(vals)) < 1e-9
    assert abs(row["s"] - statistics.stdev(vals)) < 1e-6


def test_dstddev_small_n(spark):
    one = spark.createDataFrame([(1.0,)], "v double")
    assert one.agg(dstddev("v", "s")).collect()[0]["s"] is None


def test_fast_mode_toggle(spark):
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.functions import exact

    df = spark.createDataFrame([(1.5,), (2.5,), (3.0,)], "v double")
    exact.set_exact_mode(False)
    try:
        fast = df.agg(dsum("v", "s"), davg("v", "m"), dstddev("v", "sd")).collect()[0]
    finally:
        exact.set_exact_mode(True)
    slow = df.agg(dsum("v", "s"), davg("v", "m"), dstddev("v", "sd")).collect()[0]
    assert abs(fast["s"] - slow["s"]) < 1e-9
    assert abs(fast["m"] - slow["m"]) < 1e-9
    assert abs(fast["sd"] - slow["sd"]) < 1e-9
