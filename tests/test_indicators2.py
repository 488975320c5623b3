"""Unit tests for the second indicator batch (operators/finance.py):
Williams %R, MFI, ROC/momentum, pivot points, Chaikin A/D + CMF,
Aroon, and overnight gaps. Each pins the hand-checked math on a tiny
bar series plus the edge conventions the SQL oracles replay (NULL on
flat windows, first-bar exclusions, latest-bar tie-breaks)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.finance import (
    aroon,
    chaikin_ad,
    money_flow_index,
    overnight_gaps,
    pivot_points,
    rate_of_change,
    williams_r,
)


def _bars(spark, rows):
    """rows: (sym, t, open, high, low, close, volume)"""
    return spark.createDataFrame(
        [
            Row(
                sym=s,
                t=t,
                open=float(o),
                high=float(h),
                low=float(lo),
                close=float(c),
                volume=int(v),
            )
            for (s, t, o, h, lo, c, v) in rows
        ]
    )


class TestWilliamsR:
    def test_extremes_and_midpoint(self, spark):
        # range [90, 110]: close at high -> 0, at low -> -100, mid -> -50
        df = _bars(
            spark,
            [
                ("A", 1, 100, 110, 90, 110, 10),
                ("A", 2, 100, 105, 95, 90, 10),  # window range still 90..110
                ("A", 3, 100, 100, 100, 100, 10),
            ],
        )
        out = {r.t: r for r in williams_r(df, ["sym"], "t", n=14).collect()}
        assert out[1].williams_r == 0.0
        assert out[2].williams_r == -100.0
        assert out[3].williams_r == -50.0

    def test_flat_window_is_null(self, spark):
        df = _bars(spark, [("A", 1, 5, 5, 5, 5, 1)])
        [r] = williams_r(df, ["sym"], "t").collect()
        assert r.williams_r is None


class TestMfi:
    def test_all_up_is_100_all_down_is_0(self, spark):
        up = _bars(
            spark,
            [("A", t, p, p, p, p, 10) for t, p in enumerate([10, 11, 12, 13])],
        )
        out = sorted(money_flow_index(up, ["sym"], "t").collect(), key=lambda r: r.t)
        # first bar: no prev tp -> both sums 0 -> NULL
        assert out[0].mfi is None
        assert all(r.mfi == 100.0 for r in out[1:])
        down = _bars(
            spark,
            [("A", t, p, p, p, p, 10) for t, p in enumerate([13, 12, 11, 10])],
        )
        out = sorted(money_flow_index(down, ["sym"], "t").collect(), key=lambda r: r.t)
        assert out[0].mfi is None
        assert all(r.mfi == 0.0 for r in out[1:])

    def test_volume_weighting(self, spark):
        # up-flow 11*300, down-flow 10*100 -> MFI = 100*3300/(3300+1000)
        df = _bars(
            spark,
            [
                ("A", 1, 10, 10, 10, 10, 50),
                ("A", 2, 11, 11, 11, 11, 300),
                ("A", 3, 10, 10, 10, 10, 100),
            ],
        )
        out = {r.t: r for r in money_flow_index(df, ["sym"], "t").collect()}
        assert out[3].mfi == pytest.approx(100.0 * 3300 / 4300)


class TestRocMomentum:
    def test_known_change(self, spark):
        df = _bars(
            spark,
            [("A", t, p, p, p, p, 1) for t, p in enumerate([100] * 10 + [125])],
        )
        out = sorted(rate_of_change(df, ["sym"], "t").collect(), key=lambda r: r.t)
        assert all(r.roc is None for r in out[:10])
        assert out[10].roc == 25.0
        assert out[10].momentum == 25.0
        assert out[10].prior_close == 100.0


class TestPivotPoints:
    def test_levels_from_previous_bar(self, spark):
        df = _bars(
            spark,
            [("A", 1, 100, 110, 90, 105, 1), ("A", 2, 105, 108, 101, 104, 1)],
        )
        out = {r.t: r for r in pivot_points(df, ["sym"], "t").collect()}
        assert out[1].pivot is None
        p = (110 + 90 + 105) / 3.0
        assert out[2].pivot == pytest.approx(p)
        assert out[2].r1 == pytest.approx(2 * p - 90)
        assert out[2].s1 == pytest.approx(2 * p - 110)
        assert out[2].r2 == pytest.approx(p + 20)
        assert out[2].s2 == pytest.approx(p - 20)


class TestChaikinAd:
    def test_close_at_high_accumulates_full_volume(self, spark):
        # close == high -> mfm 1 -> ad += volume; close == low -> ad -= volume
        df = _bars(
            spark,
            [
                ("A", 1, 10, 12, 8, 12, 100),
                ("A", 2, 10, 12, 8, 8, 40),
            ],
        )
        out = {r.t: r for r in chaikin_ad(df, ["sym"], "t", n=20).collect()}
        assert out[1].ad == 100.0
        assert out[2].ad == 60.0
        assert out[2].cmf == pytest.approx(60.0 / 140.0)

    def test_flat_bar_contributes_zero(self, spark):
        df = _bars(spark, [("A", 1, 5, 5, 5, 5, 99)])
        [r] = chaikin_ad(df, ["sym"], "t").collect()
        assert r.ad == 0.0


class TestAroon:
    def test_fresh_extremes(self, spark):
        # strictly rising closes/highs: every bar IS the highest high
        df = _bars(
            spark,
            [("A", t, p, p + 1, p - 1, p, 1) for t, p in enumerate([10, 11, 12, 13])],
        )
        out = sorted(aroon(df, ["sym"], "t", n=25).collect(), key=lambda r: r.t)
        assert all(r.aroon_up == 100.0 for r in out)
        # the lowest low keeps receding: down decays 4 points per bar
        assert [r.aroon_down for r in out] == [100.0, 96.0, 92.0, 88.0]
        assert out[-1].aroon_osc == 12.0

    def test_tie_breaks_to_latest_bar(self, spark):
        # two equal highs: bars-since counts from the LATER one
        df = _bars(
            spark,
            [
                ("A", 1, 10, 20, 5, 10, 1),
                ("A", 2, 10, 20, 6, 10, 1),
                ("A", 3, 10, 15, 7, 10, 1),
            ],
        )
        out = sorted(aroon(df, ["sym"], "t", n=25).collect(), key=lambda r: r.t)
        # at t=3 the highest high (20) was last seen at t=2 -> 1 bar since
        assert out[2].aroon_up == (25 - 1) * 4.0


class TestOvernightGaps:
    def test_gap_math_and_fill(self, spark):
        df = _bars(
            spark,
            [
                ("A", 1, 100, 105, 95, 100, 1),
                # +5% gap up, traded back to 99 -> filled
                ("A", 2, 105, 106, 99, 103, 1),
                # gap down from 103 to 100, never re-touched 103 -> not filled
                ("A", 3, 100, 101, 98, 99, 1),
            ],
        )
        out = {r.t: r for r in overnight_gaps(df, ["sym"], "t").collect()}
        assert 1 not in out  # first bar has no gap
        assert out[2].gap_pct == 5.0
        assert out[2].direction == 1
        assert out[2].filled is True
        assert out[3].direction == -1
        assert out[3].filled is False


class TestAdx:
    def test_pure_uptrend_saturates(self, spark):
        # h=l=c strictly rising: +DM == TR every bar, so +DI = 100,
        # -DI = 0, DX = 100, and ADX = 100 from its seed bar (2n) on
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.finance import (
            adx,
        )

        df = _bars(
            spark,
            [("A", t, 10 + t, 10 + t, 10 + t, 10 + t, 1) for t in range(30)],
        )
        out = sorted(adx(df, ["sym"], "t", n=14).collect(), key=lambda r: r.t)
        # warm-up: DI NULL through bar n (index n-1), ADX NULL through 2n-1
        assert all(r.pdi is None for r in out[:14])
        assert all(r.adx is None for r in out[:27])
        assert all(r.pdi == 100.0 and r.mdi == 0.0 for r in out[14:])
        assert all(r.adx == 100.0 for r in out[27:])

    def test_flat_market_edges(self, spark):
        # constant price: TR sums are 0 -> DI NULL; DX defined 0 -> ADX 0
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.finance import (
            adx,
        )

        df = _bars(spark, [("A", t, 5, 5, 5, 5, 1) for t in range(30)])
        out = sorted(adx(df, ["sym"], "t", n=14).collect(), key=lambda r: r.t)
        assert all(r.pdi is None and r.mdi is None for r in out)
        assert all(r.adx == 0.0 for r in out[27:])

    def test_short_series_all_null(self, spark):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.finance import (
            adx,
        )

        df = _bars(spark, [("A", t, 10, 11, 9, 10, 1) for t in range(5)])
        out = adx(df, ["sym"], "t", n=14).collect()
        assert all(r.pdi is None and r.adx is None for r in out)
