"""Property-based tests (hypothesis) for semantics that must hold on any
input: dedup idempotence/direction, resample conservation, rollup bounds,
exact-agg partition invariance."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

MAX_EXAMPLES = 12  # each example spins Spark jobs; keep the suite fast

candle_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),        # symbol idx
        st.integers(min_value=0, max_value=50),       # ts slot
        st.floats(min_value=0.01, max_value=1e4,
                  allow_nan=False, allow_infinity=False),
        st.integers(min_value=0, max_value=5),        # arrival seq
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(candle_lists)
def test_dedup_properties(rows):
    spark = _spark()
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.dedup import (
        dedup_by_key,
    )

    df = spark.createDataFrame(
        [(f"S{s}", t, round(v, 2), q) for s, t, v, q in rows],
        "symbol string, t long, v double, seq long",
    )
    out = dedup_by_key(df, ["symbol", "t"], ["seq", "v"], keep="last")
    got = out.collect()
    # exactly one row per key, and idempotent
    keys = [(r["symbol"], r["t"]) for r in got]
    assert len(keys) == len(set(keys))
    assert len(keys) == df.select("symbol", "t").distinct().count()
    assert dedup_by_key(out, ["symbol", "t"], ["seq", "v"], keep="last").count() == len(keys)
    # last-wins picks the max (seq, v) per key
    expect = {}
    for s, t, v, q in rows:
        k = (f"S{s}", t)
        cand = (q, round(v, 2))
        if k not in expect or cand > expect[k]:
            expect[k] = cand
    assert {(r["symbol"], r["t"]): (r["seq"], r["v"]) for r in got} == expect


@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(candle_lists)
def test_resample_conserves_count_and_extremes(rows):
    spark = _spark()
    from pyspark.sql import functions as F

    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.resample import (
        resample_series,
    )

    df = spark.createDataFrame(
        [(f"S{s}", t * 60, round(v, 2), i) for i, (s, t, v, _) in enumerate(rows)],
        "symbol string, epoch long, v double, seq long",
    ).withColumn("ts", F.timestamp_seconds("epoch"))
    out = resample_series(df, 10, ["symbol"], "ts", "v", tiebreak="seq").collect()
    assert sum(r["num_records"] for r in out) == len(rows)
    assert max(r["high"] for r in out) == max(round(v, 2) for _, _, v, _ in rows)
    assert min(r["low"] for r in out) == min(round(v, 2) for _, _, v, _ in rows)
    for r in out:  # OHLC invariants per bucket
        assert r["low"] <= r["open"] <= r["high"]
        assert r["low"] <= r["close"] <= r["high"]


def _spark():
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark import get_spark

    return get_spark("tests", shuffle_partitions=8)
