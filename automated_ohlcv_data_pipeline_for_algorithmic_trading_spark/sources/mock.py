"""Deterministic mock OHLCV source (SURVEY.md S2).

The reference ships a demo-mode generator producing ~150 random candles
per symbol at 5-minute spacing (ingestion/lambda_ingestion.py:476-524).
This is its Spark-native twin: generated distributedly from
``spark.range`` + seeded ``F.rand`` column expressions — no driver-side
loops, so it scales to any synthetic size. Seed defaults to 42 per
FIXTURES.md.
"""

from __future__ import annotations

import json
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: NSE session: 09:15-15:30 IST. We generate in UTC like the pipeline.
CANDLES_PER_DAY = 75  # 375 session minutes / 5


def mock_candles(
    spark: SparkSession,
    symbols: list[str],
    days: int = 1,
    start: str = "2024-01-01",
    seed: int = 42,
    base_price: float = 1000.0,
    duplicate_fraction: float = 0.0,
) -> DataFrame:
    """Distributed candle generator: one row per (symbol, day, slot).

    Prices are seeded-random walks around ``base_price``; OHLC invariants
    (high >= max(open, close), low <= min(open, close), volume >= 0) hold
    by construction. ``duplicate_fraction`` > 0 re-emits that share of
    candles with perturbed values and a later fetch sequence — the
    overlapping-refetch shape the real feed produces (FIXTURES.md SS2).
    """
    n_sym = len(symbols)
    total = n_sym * days * CANDLES_PER_DAY
    base_ts = int(
        datetime.strptime(start, "%Y-%m-%d")
        .replace(tzinfo=timezone.utc)
        .timestamp()
    ) + 3 * 3600 + 45 * 60  # 03:45 UTC == 09:15 IST
    sym_arr = F.array(*[F.lit(s) for s in symbols])

    df = (
        spark.range(total)
        .withColumn("_sym_idx", (F.col("id") % n_sym).cast("int"))
        .withColumn("_day", (F.col("id") / n_sym).cast("long") / CANDLES_PER_DAY)
        .withColumn("_day", F.col("_day").cast("int"))
        .withColumn(
            "_slot", ((F.col("id") / n_sym).cast("long") % CANDLES_PER_DAY).cast("int")
        )
        .withColumn("symbol", F.element_at(sym_arr, F.col("_sym_idx") + 1))
        .withColumn(
            "timestamp_unix",
            (
                F.lit(base_ts)
                + F.col("_day") * 86400
                + F.col("_slot") * 300
            ).cast("long"),
        )
        .withColumn("_r1", F.rand(seed))
        .withColumn("_r2", F.rand(seed + 1))
        .withColumn("_r3", F.rand(seed + 2))
        .withColumn("_r4", F.rand(seed + 3))
        .withColumn(
            "open", F.round(base_price * (1 + (F.col("_r1") - 0.5) * 0.1), 2)
        )
        .withColumn(
            "close", F.round(F.col("open") * (1 + (F.col("_r2") - 0.5) * 0.02), 2)
        )
        .withColumn(
            "high",
            F.round(F.greatest("open", "close") * (1 + F.col("_r3") * 0.01), 2),
        )
        .withColumn(
            "low",
            F.round(F.least("open", "close") * (1 - F.col("_r4") * 0.01), 2),
        )
        .withColumn("volume", (F.col("_r1") * 100000).cast("long") + 100)
        .withColumn("fetch_seq", F.lit(0))
        .select(
            "symbol", "timestamp_unix", "open", "high", "low", "close",
            "volume", "fetch_seq",
        )
    )
    if duplicate_fraction > 0:
        dups = (
            df.withColumn("_r", F.rand(seed + 9))
            .filter(F.col("_r") < duplicate_fraction)
            .drop("_r")
            .withColumn("close", F.round(F.col("close") * 1.001, 2))
            .withColumn("fetch_seq", F.lit(1))
        )
        df = df.unionByName(dups)
    return df


def candles_to_envelopes(df: DataFrame, resolution: str = "5") -> DataFrame:
    """Fold a flat candle frame into the raw ingestion envelope shape:
    one row per (symbol, fetch_seq) holding the candles array — the
    writer-side inverse of the ETL explode (P1/P2)."""
    return (
        df.groupBy("symbol", "fetch_seq")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        "timestamp_unix",
                        F.array(
                            F.col("timestamp_unix").cast("double"),
                            "open", "high", "low", "close",
                            F.col("volume").cast("double"),
                        ).alias("candle"),
                    )
                )
            ).alias("_sorted")
        )
        .select(
            "symbol",
            "fetch_seq",
            F.transform(F.col("_sorted"), lambda s: s["candle"]).alias("candles"),
        )
    )


def write_mock_envelope_files(
    spark: SparkSession,
    out_dir: str,
    symbols: list[str],
    days: int = 1,
    fetches: int = 2,
    seed: int = 42,
) -> list[str]:
    """Write raw-zone JSON envelope files, several overlapping fetches per
    day (each fetch re-pulls the whole day — the reference's duplicate
    semantics, ingestion/lambda_ingestion.py:313). Driver-side json.dump is
    fine here: this is a test fixture writer, not a data path."""
    candles = mock_candles(spark, symbols, days=days, seed=seed).collect()
    paths = []
    for fetch in range(fetches):
        data = {}
        for s in symbols:
            rows = sorted(
                [r for r in candles if r["symbol"] == s],
                key=lambda r: r["timestamp_unix"],
            )
            # later fetches see a superset of candles (cumulative day pull)
            upto = len(rows) * (fetch + 1) // fetches
            data[s] = {
                "symbol": s,
                "resolution": "5",
                "candles": [
                    [
                        float(r["timestamp_unix"]), r["open"], r["high"],
                        r["low"], r["close"], float(r["volume"]),
                    ]
                    for r in rows[:upto]
                ],
                "timestamp": f"2024-01-01T{10 + fetch}:00:00Z",
                "metadata": {"fetch": str(fetch)},
            }
        env = {
            "data": data,
            "metadata": {
                "total_symbols_requested": str(len(symbols)),
                "successful_symbols": str(len(symbols)),
                "ingestion_timestamp": f"2024-01-01T{10 + fetch}:00:00Z",
            },
        }
        path = f"{out_dir}/raw_file_2024010{1}_{fetch:02d}.json"
        with open(path, "w") as f:
            json.dump(env, f)
        paths.append(path)
    return paths
