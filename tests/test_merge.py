"""Partition-scoped parquet MERGE upsert (plans/merge.py): the row-level
idempotent re-run contract (reference README.md:113) without a lakehouse
table format."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.plans.merge import (
    merge_into_parquet,
)

SCHEMA = "sym string, dt string, t long, v double, seq long"


def _rows(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _read(spark, path):
    df = spark.read.parquet(path).withColumn("dt", F.col("dt").cast("string"))
    return {(r["sym"], r["dt"], r["t"]): r["v"] for r in df.collect()}


def test_merge_insert_update_preserve(spark, tmp_path):
    path = str(tmp_path / "tbl")
    base = _rows(
        spark,
        [
            ("A", "2024-01-01", 1, 10.0, 0),
            ("A", "2024-01-01", 2, 20.0, 0),
            ("B", "2024-01-01", 1, 30.0, 0),
        ],
    )
    merge_into_parquet(spark, path, base, ["sym", "dt", "t"], ["sym", "dt"])
    assert _read(spark, path) == {
        ("A", "2024-01-01", 1): 10.0,
        ("A", "2024-01-01", 2): 20.0,
        ("B", "2024-01-01", 1): 30.0,
    }

    # capture B's physical files: an A-only batch must not touch them
    b_files = sorted(glob.glob(f"{path}/sym=B/**/*.parquet", recursive=True))
    b_mtimes = [os.path.getmtime(f) for f in b_files]

    batch = _rows(
        spark,
        [
            ("A", "2024-01-01", 2, 21.0, 1),  # WHEN MATCHED -> update
            ("A", "2024-01-01", 3, 40.0, 1),  # WHEN NOT MATCHED -> insert
        ],
    )
    merge_into_parquet(spark, path, batch, ["sym", "dt", "t"], ["sym", "dt"])
    assert _read(spark, path) == {
        ("A", "2024-01-01", 1): 10.0,   # untouched key survives
        ("A", "2024-01-01", 2): 21.0,   # updated
        ("A", "2024-01-01", 3): 40.0,   # inserted
        ("B", "2024-01-01", 1): 30.0,   # untouched partition survives
    }
    assert [
        os.path.getmtime(f)
        for f in sorted(glob.glob(f"{path}/sym=B/**/*.parquet", recursive=True))
    ] == b_mtimes  # B's files were never rewritten


def test_merge_idempotent_replay_and_batch_last_wins(spark, tmp_path):
    path = str(tmp_path / "tbl")
    merge_into_parquet(
        spark,
        path,
        _rows(spark, [("A", "2024-01-01", 1, 1.0, 0)]),
        ["sym", "dt", "t"],
        ["sym", "dt"],
    )
    # one batch, two rows for the same key: last by seq wins
    batch = _rows(
        spark,
        [("A", "2024-01-01", 1, 5.0, 1), ("A", "2024-01-01", 1, 7.0, 2)],
    )
    for _ in range(3):  # replaying the same batch must be a no-op after run 1
        merge_into_parquet(
            spark, path, batch, ["sym", "dt", "t"], ["sym", "dt"], order_col="seq"
        )
        assert _read(spark, path) == {("A", "2024-01-01", 1): 7.0}
        assert spark.read.parquet(path).count() == 1


def test_merge_many_touched_partitions_semi_join_path(spark, tmp_path):
    """A backfill touching more partitions than the literal threshold
    takes the broadcast tuple-semi-join path: same row-level result, plan
    size constant in the number of touched partitions."""
    path = str(tmp_path / "tbl")
    base = _rows(
        spark,
        [("S%03d" % i, "2024-01-01", 1, float(i), 0) for i in range(120)],
    )
    merge_into_parquet(spark, path, base, ["sym", "dt", "t"], ["sym", "dt"])

    # backfill touches all 120 (sym, dt) partitions -> above the default
    # 64-literal cap -> semi-join path; updates half the keys, inserts a
    # new t per partition
    batch = _rows(
        spark,
        [("S%03d" % i, "2024-01-01", 1, float(i) + 0.5, 1) for i in range(0, 120, 2)]
        + [("S%03d" % i, "2024-01-01", 2, 1000.0 + i, 1) for i in range(120)],
    )
    merge_into_parquet(spark, path, batch, ["sym", "dt", "t"], ["sym", "dt"])

    got = _read(spark, path)
    assert len(got) == 240
    for i in range(120):
        expect_v1 = float(i) + (0.5 if i % 2 == 0 else 0.0)
        assert got[("S%03d" % i, "2024-01-01", 1)] == expect_v1
        assert got[("S%03d" % i, "2024-01-01", 2)] == 1000.0 + i

    # forcing the literal path on the same shape agrees (strategy is an
    # optimization, never a semantics change)
    batch2 = _rows(
        spark,
        [("S%03d" % i, "2024-01-01", 3, -1.0 * i, 2) for i in range(120)],
    )
    merge_into_parquet(
        spark, path, batch2, ["sym", "dt", "t"], ["sym", "dt"],
        literal_partition_max=1000,
    )
    got2 = _read(spark, path)
    assert len(got2) == 360
    assert got2[("S000", "2024-01-01", 3)] == 0.0
    assert got2[("S119", "2024-01-01", 3)] == -119.0
