"""Incremental materialized-rollup maintenance (plans/rollup_refresh.py):
refreshes recompute ONLY touched days, untouched day partitions keep
their physical files, and the maintained table always equals a
from-scratch rebuild."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.rollup import (
    daily_rollup,
)
from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.plans.rollup_refresh import (
    read_daily_rollup,
    refresh_daily_rollup,
)

SCHEMA = "sym string, ts string, px double, vol double, eid long"


def _facts(spark, rows):
    return spark.createDataFrame(list(rows), SCHEMA).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


def _rollup_dict(df):
    return {
        (r["sym"], str(r["trade_date"])): (r["open"], r["close"], r["num_records"])
        for r in df.collect()
    }


def test_refresh_touches_only_batch_days(spark, tmp_path):
    path = str(tmp_path / "rollup")
    day1 = [("A", "2024-01-01 10:00:00", 10.0, 1.0, 1),
            ("A", "2024-01-01 11:00:00", 11.0, 1.0, 2)]
    day2 = [("A", "2024-01-02 10:00:00", 20.0, 1.0, 3)]
    day3 = [("B", "2024-01-03 10:00:00", 30.0, 1.0, 4)]
    facts = _facts(spark, day1 + day2 + day3)

    # bootstrap: full rebuild
    refresh_daily_rollup(
        spark, facts, path, ["sym"], "ts", "px", "vol", tiebreak="eid"
    )
    assert _rollup_dict(read_daily_rollup(spark, path)) == _rollup_dict(
        daily_rollup(facts, ["sym"], "ts", "px", "vol", tiebreak="eid")
    )
    d1_files = sorted(glob.glob(f"{path}/trade_date=2024-01-01/*.parquet"))
    d1_mtimes = [os.path.getmtime(f) for f in d1_files]

    # a batch lands more day-2 rows (late close) — refresh with batch scope
    late = [("A", "2024-01-02 15:00:00", 21.0, 1.0, 5)]
    facts2 = _facts(spark, day1 + day2 + day3 + late)
    refresh_daily_rollup(
        spark, facts2, path, ["sym"], "ts", "px", "vol", tiebreak="eid",
        batch=_facts(spark, late),
    )
    got = _rollup_dict(read_daily_rollup(spark, path))
    want = _rollup_dict(
        daily_rollup(facts2, ["sym"], "ts", "px", "vol", tiebreak="eid")
    )
    assert got == want                       # table == from-scratch rebuild
    assert got[("A", "2024-01-02")][1] == 21.0  # new close visible
    # day-1 partition was never rewritten
    assert [
        os.path.getmtime(f)
        for f in sorted(glob.glob(f"{path}/trade_date=2024-01-01/*.parquet"))
    ] == d1_mtimes

    # replaying the same batch is an idempotent rewrite of identical rows
    refresh_daily_rollup(
        spark, facts2, path, ["sym"], "ts", "px", "vol", tiebreak="eid",
        batch=_facts(spark, late),
    )
    assert _rollup_dict(read_daily_rollup(spark, path)) == want
