"""distributed_row_number — parity with the ungrouped global row_number.

The two-pass rank (operators/rank.py) must be BIT-identical to
``row_number() OVER (ORDER BY ...)`` for any total-order key, while never
planning a single-task global sort over the data.
"""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.rank import (
    distributed_row_number,
)


def _global_ranked(df, order_by):
    w = Window.orderBy(*order_by)
    return df.withColumn("_rk", F.row_number().over(w).cast("long"))


def test_rank_parity_random(spark):
    rng = random.Random(7)
    rows = [(i, rng.randint(0, 50), rng.random()) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, k long, v double")
    order = [F.col("k").desc(), F.col("id").asc()]
    got = distributed_row_number(df, order, num_partitions=7).select(
        "id", "_rk"
    )
    want = _global_ranked(df, order).select("id", "_rk")
    assert got.join(want, "id").filter(
        got["_rk"] != want["_rk"]
    ).count() == 0  # noqa: E712 — full anti-parity check
    # ranks are a permutation of 1..n
    n = df.count()
    assert got.agg(F.min("_rk"), F.max("_rk"), F.count("*")).first() == (
        1,
        n,
        n,
    )


def test_rank_heavy_ties(spark):
    # 90% of rows share one key value — ties must resolve by the unique
    # tie-break column identically to the global window.
    rows = [(i, 0 if i % 10 else i) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, k long")
    order = [F.col("k").asc(), F.col("id").asc()]
    got = distributed_row_number(df, order, num_partitions=5)
    want = _global_ranked(df, order)
    mismatches = (
        got.select("id", F.col("_rk").alias("g"))
        .join(want.select("id", F.col("_rk").alias("w")), "id")
        .filter(F.col("g") != F.col("w"))
        .count()
    )
    assert mismatches == 0


def test_rank_empty_and_single(spark):
    empty = spark.createDataFrame([], "id long, k long")
    assert (
        distributed_row_number(empty, [F.col("k")], num_partitions=4).count()
        == 0
    )
    one = spark.createDataFrame([(1, 9)], "id long, k long")
    assert distributed_row_number(
        one, [F.col("k")], num_partitions=4
    ).first()["_rk"] == 1


def test_rank_no_ungrouped_window(spark):
    # The physical plan must not contain a Window over an EMPTY partition
    # spec on the data path (the single-task shape this operator removes).
    # Our windows are PARTITION BY pid (data) and the P-row offset window,
    # whose input is the tiny counts aggregate, never the raw table.
    df = spark.range(10000).select(
        F.col("id"), (F.col("id") % 97).alias("k")
    )
    ranked = distributed_row_number(
        df, [F.col("k").asc(), F.col("id").asc()], num_partitions=8
    )
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    # every Window node that sorts the stamped data must carry the pid
    # partition key; the offsets window input is an Aggregate, not a scan
    for line in plan.splitlines():
        if "Window [" in line and "__dr_pid" not in line:
            # the offsets prefix-sum window — verify it is partition-count
            # sized by checking it references the count column only
            assert "_c" in line or "__dr_off" in line, line


def test_running_sum_parity_random(spark):
    """distributed_running_sum == the ungrouped cumulative window, bit
    for bit, on a distinct-keyed table (the histogram shape every
    in-repo caller feeds it)."""
    rng = random.Random(11)
    rows = [(k, rng.randint(-5, 100)) for k in range(1500)]
    df = spark.createDataFrame(rows, "k long, v long")
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.rank import (
        distributed_running_sum,
    )

    got = distributed_running_sum(
        df, [F.col("k").asc()], "v", "_cs", num_partitions=7, total_col="_n"
    )
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = df.withColumn("_cs", F.sum("v").over(w).cast("long"))
    mismatches = (
        got.select("k", F.col("_cs").alias("g"))
        .join(want.select("k", F.col("_cs").alias("w")), "k")
        .filter(F.col("g") != F.col("w"))
        .count()
    )
    assert mismatches == 0
    total = sum(v for _, v in rows)
    assert got.select("_n").distinct().collect() == [(total,)]


def test_running_sum_empty(spark):
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.rank import (
        distributed_running_sum,
    )

    df = spark.createDataFrame([], "k long, v long")
    out = distributed_running_sum(
        df, [F.col("k").asc()], "v", "_cs", total_col="_n"
    )
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["k", "v", "_cs", "_n"]


def test_no_unpartitioned_window_in_plan(spark):
    """The structural point of the two-pass helpers: the physical plan
    must contain no ungrouped WindowExec (the 'No Partition Defined'
    shape that collapses data to one task)."""
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.rank import (
        distributed_running_sum,
    )

    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    for out in (
        distributed_row_number(df, [F.col("k").asc()], "_rk"),
        distributed_running_sum(df, [F.col("k").asc()], "v", "_cs"),
    ):
        plan = out._jdf.queryExecution().executedPlan().toString()
        for line in plan.splitlines():
            if "Window" in line:
                # every WindowExec must carry a partition spec
                assert "__dr_pid" in line, line
