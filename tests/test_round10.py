"""Round-10 additions: multiplicative Holt-Winters (division-state
fold), packed_running_sum (lazy bounded-table prefix sum), and the
packed quantile_bucket strategy."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_holt_winters_mul_hand_replay_and_constant_series(spark):
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.finance import (
        holt_winters_multiplicative,
    )

    # multiplicative sawtooth: +-20% around a drifting level — the
    # factor profile must absorb the proportional swing
    vals = [100.0 * (1.0 + 0.04 * (i % 7)) + i for i in range(42)]
    rows = [(1, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "user_id long, rn long, close double")
    got = (
        holt_winters_multiplicative(df, ["user_id"], "rn", period=7)
        .orderBy("rn")
        .collect()
    )

    def sdiv(num, den=1_000_000):
        return num // den if num >= 0 else -((-num) // den)

    l = b = 0
    s = [1_000_000] * 7
    for i, v in enumerate(vals):
        y = math.floor(v * 1e6 + 0.5)
        slot = i % 7
        if i == 0:
            l, b = y, 0
        else:
            sold = min(max(s[slot], 100_000), 10_000_000)
            detr = sdiv(y * 1_000_000, sold)
            lp = l
            l = sdiv(300_000 * detr + 700_000 * (l + b))
            b = sdiv(100_000 * (l - lp) + 900_000 * b)
            ratio = min(
                max(sdiv(y * 1_000_000, max(l, 1)), 100_000), 10_000_000
            )
            s[slot] = sdiv(300_000 * ratio + 700_000 * sold)
        r = got[i]
        assert r["level"] == l / 1e6
        assert r["trend"] == b / 1e6
        assert r["season"] == s[slot] / 1e6
        assert r["forecast"] == sdiv((l + b) * s[(i + 1) % 7]) / 1e6

    # constant series: the multiplicative fixed point is exact —
    # level = const, trend = 0, every factor 1.0, forecast = const
    cdf = spark.createDataFrame(
        [(1, i, 250.0) for i in range(20)],
        "user_id long, rn long, close double",
    )
    for r in (
        holt_winters_multiplicative(cdf, ["user_id"], "rn", period=7)
        .orderBy("rn")
        .collect()
    ):
        assert r["level"] == 250.0
        assert r["trend"] == 0.0
        assert r["season"] == 1.0
        assert r["forecast"] == 250.0


def test_packed_running_sum_matches_distributed_and_is_lazy(spark):
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.rank import (
        distributed_running_sum,
        packed_running_sum,
    )

    rows = [(k, (k * 37) % 101) for k in range(50)]
    df = spark.createDataFrame(rows, "k long, v long")
    jobs_before = spark.sparkContext._jsc.sc().dagScheduler().numTotalJobs()
    packed = packed_running_sum(df, "k", "v", "_c")
    # laziness: building the plan must not have run any Spark job (the
    # eager two-pass variant runs two at call time — round-9 ADVICE)
    jobs_after = spark.sparkContext._jsc.sc().dagScheduler().numTotalJobs()
    assert jobs_after == jobs_before
    got = {r["k"]: r["_c"] for r in packed.collect()}
    want = {
        r["k"]: r["_c"]
        for r in distributed_running_sum(
            df, [F.col("k").asc()], "v", "_c"
        ).collect()
    }
    assert got == want
    acc = 0
    for k, v in rows:
        acc += v
        assert got[k] == acc

    # empty input -> empty output, schema intact
    empty = spark.createDataFrame([], "k long, v long")
    out = packed_running_sum(empty, "k", "v", "_c")
    assert out.columns == ["k", "v", "_c"]
    assert out.count() == 0


def test_quantile_bucket_packed_equals_twopass(spark):
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.quantiles import (
        quantile_bucket,
    )

    rows = [(i, (i * 13) % 47) for i in range(300)] + [(300, None)]
    df = spark.createDataFrame(rows, "id long, score long")
    a = {
        r["id"]: r["b"]
        for r in quantile_bucket(
            df, "score", 5, "b", strategy="packed"
        ).collect()
    }
    b = {
        r["id"]: r["b"]
        for r in quantile_bucket(
            df, "score", 5, "b", strategy="twopass"
        ).collect()
    }
    assert a == b
    assert a[300] is None  # NULL value -> NULL bucket
    # buckets are monotone in the value and span 1..5
    by_score = sorted(
        ((s, a[i]) for i, s in rows if s is not None), key=lambda t: t[0]
    )
    bs = [bb for _, bb in by_score]
    assert bs == sorted(bs)
    assert bs[0] == 1 and bs[-1] == 5


def test_emb_dedup_stream_batch_independence_and_index_growth(spark, sf_dir):
    """The streaming embedding dedup's survivor set must not depend on
    how the stream is chopped into micro-batches (the id-monotone
    contract), and the persisted index must grow by EXACTLY the stream
    rows — every batch vector indexed once, the corpus never
    re-assigned."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as E
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_corpus = emb.filter(F.col("vec_id") % 10 != 0).count()
    n_stream = emb.filter(F.col("vec_id") % 10 == 0).count()

    s1, idx1 = E._run_emb_dedup_stream(spark, sf_dir, n_batches=1)
    s4, idx4 = E._run_emb_dedup_stream(spark, sf_dir, n_batches=4)
    rows1 = [(r["vec_id"], r["cell"]) for r in s1.collect()]
    rows4 = [(r["vec_id"], r["cell"]) for r in s4.collect()]
    assert rows1 == rows4, "survivors depend on batch boundaries"
    assert idx1 == n_corpus + n_stream
    assert idx4 == n_corpus + n_stream
    # dedup actually fires on this data, and survivors are stream-only
    assert 0 < len(rows4) < n_stream
    assert all(v % 10 == 0 for v, _ in rows4)
