"""Unit tests for the portfolio-risk operators (finance.py), the
deterministic HLL sketch (sketch.py), and the SCD2 history build
(scd.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.finance import (
    beta_vs_market,
    daily_returns,
    max_drawdown,
    max_drawdown_chunked,
)
from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.scd import (
    scd2_history,
)
from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.sketch import (
    cms_estimate,
    cms_sketch,
    hll_estimate,
    hll_registers,
    merge_cms,
    merge_registers,
)


def _prices(spark, rows):
    return spark.createDataFrame(
        [Row(sym=s, ts=t, pid=i, px=float(p)) for i, (s, t, p) in enumerate(rows)]
    )


class TestMaxDrawdown:
    def test_simple_peak_trough(self, spark):
        # 100 -> 120 -> 60 -> 90: worst drawdown is 60/120 - 1 = -50%
        df = _prices(spark, [("A", 1, 100), ("A", 2, 120), ("A", 3, 60), ("A", 4, 90)])
        out = max_drawdown(df, ["sym"], "ts", "pid", "px").collect()
        assert len(out) == 1
        r = out[0]
        assert r.max_drawdown == pytest.approx(-0.5)
        assert r.trough_ts == 3 and r.trough_value == 60.0 and r.n_obs == 4

    def test_monotonic_rise_has_zero_drawdown(self, spark):
        df = _prices(spark, [("A", 1, 10), ("A", 2, 20), ("A", 3, 30)])
        r = max_drawdown(df, ["sym"], "ts", "pid", "px").collect()[0]
        # drawdown 0 at every point; trough tie-breaks to the earliest row
        assert r.max_drawdown == 0.0 and r.trough_ts == 1

    def test_non_positive_prices_excluded(self, spark):
        df = _prices(spark, [("A", 1, 100), ("A", 2, -5), ("A", 3, 50)])
        r = max_drawdown(df, ["sym"], "ts", "pid", "px").collect()[0]
        assert r.n_obs == 2 and r.max_drawdown == pytest.approx(-0.5)

    def test_chunked_variant_identical(self, spark):
        # chunk width 10 -> chunk boundaries cut through each key's
        # history; outputs must still match the plain two-window form
        rows = [
            ("S%d" % (i % 7), i, 50 + ((i * 37 + (i * i) % 13) % 100))
            for i in range(500)
        ]
        df = _prices(spark, rows)
        plain = sorted(
            map(
                tuple,
                max_drawdown(
                    df, ["sym"], "ts", "pid", "px", skew_safe=False
                ).collect(),
            )
        )
        chunked = sorted(
            map(
                tuple,
                max_drawdown_chunked(
                    df, ["sym"], "ts", "pid", "px", chunk_width=10
                ).collect(),
            )
        )
        assert plain == chunked
        # the DEFAULT call path routes through the chunked form and must
        # agree with both
        routed = sorted(
            map(
                tuple,
                max_drawdown(
                    df, ["sym"], "ts", "pid", "px", chunk_width=10
                ).collect(),
            )
        )
        assert plain == routed

    def test_partition_count_invariant(self, spark):
        rows = [("S%d" % (i % 7), i, 50 + ((i * 37) % 100)) for i in range(400)]
        df = _prices(spark, rows)
        a = sorted(map(tuple, max_drawdown(df, ["sym"], "ts", "pid", "px").collect()))
        b = sorted(
            map(
                tuple,
                max_drawdown(
                    df.repartition(13), ["sym"], "ts", "pid", "px"
                ).collect(),
            )
        )
        assert a == b


class TestBetaVsMarket:
    def test_market_itself_has_beta_one(self, spark):
        # two symbols with identical returns: market == each, beta == 1
        rows = []
        px = {"A": 100.0, "B": 200.0}
        for d in range(1, 11):
            for s in ("A", "B"):
                px[s] *= 1 + (0.01 if d % 2 else -0.005) * (1 if s == "A" else 1)
                rows.append((s, d, px[s]))
        df = spark.createDataFrame(
            [
                Row(sym=s, ts=f"2024-01-{d:02d} 12:00:00", pid=i, px=p)
                for i, (s, d, p) in enumerate(rows)
            ]
        ).withColumn("ts", F.to_timestamp("ts"))
        rets = daily_returns(df, ["sym"], "ts", "pid", "px")
        out = {r.sym: r for r in beta_vs_market(rets, ["sym"]).collect()}
        assert out["A"].beta == pytest.approx(1.0, abs=1e-9)
        assert out["A"].corr_mkt == pytest.approx(1.0, abs=1e-9)
        assert out["A"].n_days == 9

    def test_winsorize_drops_insane_returns(self, spark):
        df = spark.createDataFrame(
            [
                Row(sym="A", trade_date="2024-01-01", ret=0.01),
                Row(sym="A", trade_date="2024-01-02", ret=250.0),  # data error
                Row(sym="A", trade_date="2024-01-03", ret=-0.02),
                Row(sym="B", trade_date="2024-01-01", ret=0.02),
                Row(sym="B", trade_date="2024-01-03", ret=-0.01),
            ]
        )
        out = beta_vs_market(df, ["sym"])
        # the 250.0 return is excluded -> A still has 2 usable days
        assert {r.sym: r.n_days for r in out.collect()} == {"A": 2, "B": 2}


class TestHll:
    def test_estimate_within_hll_error(self, spark):
        n = 5000
        df = spark.range(n).select(F.col("id").alias("v"))
        regs = hll_registers(df, "v", p=8)
        est = hll_estimate(regs, p=8)
        # standard error ~1.04/sqrt(256) = 6.5%; allow 3 sigma
        assert abs(est - n) / n < 0.20

    def test_duplicates_do_not_change_sketch(self, spark):
        df = spark.range(1000)
        once = hll_registers(df.select(F.col("id").alias("v")), "v", p=6)
        thrice = hll_registers(
            df.union(df).union(df).select(F.col("id").alias("v")), "v", p=6
        )
        assert sorted(map(tuple, once.collect())) == sorted(
            map(tuple, thrice.collect())
        )

    def test_merge_law_equals_union_sketch(self, spark):
        a = spark.range(0, 800).select(F.col("id").alias("v"))
        b = spark.range(500, 1500).select(F.col("id").alias("v"))
        merged = merge_registers(
            hll_registers(a, "v", p=7), hll_registers(b, "v", p=7)
        )
        direct = hll_registers(a.union(b), "v", p=7)
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, direct.collect())
        )

    def test_small_range_linear_counting(self, spark):
        df = spark.range(30).select(F.col("id").alias("v"))
        est = hll_estimate(hll_registers(df, "v", p=8), p=8)
        assert abs(est - 30) / 30 < 0.25


class TestCms:
    def _multiset(self, spark):
        # value i appears i times, i in 1..40 -> 820 rows
        return spark.range(1, 41).selectExpr(
            "explode(array_repeat(concat('v', id), cast(id as int))) AS v"
        )

    def test_never_undercounts(self, spark):
        df = self._multiset(spark)
        cells = cms_sketch(df, "v")
        est = {
            r.value: r.cms_count
            for r in cms_estimate(cells, df, "v").collect()
        }
        for i in range(1, 41):
            assert est[f"v{i}"] >= i

    def test_wide_sketch_is_exact_on_small_input(self, spark):
        # 40 distinct values into 4x4096 cells: collision odds ~0
        df = self._multiset(spark)
        cells = cms_sketch(df, "v", depth=4, width=4096)
        est = {
            r.value: r.cms_count
            for r in cms_estimate(
                cells, df, "v", depth=4, width=4096
            ).collect()
        }
        assert est == {f"v{i}": i for i in range(1, 41)}

    def test_merge_law_equals_union_sketch(self, spark):
        a = spark.range(0, 500).selectExpr("concat('x', id % 37) AS v")
        b = spark.range(0, 700).selectExpr("concat('x', id % 53) AS v")
        merged = merge_cms(cms_sketch(a, "v"), cms_sketch(b, "v"))
        direct = cms_sketch(a.union(b), "v")
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, direct.collect())
        )


class TestScd2Lookup:
    def test_point_in_time_semantics(self, spark):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.joins import (
            asof_join,
        )

        dim = spark.createDataFrame(
            [
                Row(k="u1", valid_from=10, version=1, state="a"),
                Row(k="u1", valid_from=20, version=2, state="b"),
            ]
        )
        facts = spark.createDataFrame(
            [
                Row(k="u1", fid=1, ts=5),   # before first version -> no match
                Row(k="u1", fid=2, ts=10),  # exactly at open -> version 1
                Row(k="u1", fid=3, ts=19),  # inside v1
                Row(k="u1", fid=4, ts=20),  # boundary -> new version wins
                Row(k="u1", fid=5, ts=99),  # open interval
            ]
        )
        out = asof_join(
            facts, dim, ["k"], "ts", "valid_from", tiebreak="version"
        )
        got = {r.fid: r.version_asof for r in out.collect()}
        assert got == {1: None, 2: 1, 3: 1, 4: 2, 5: 2}


class TestScd2:
    def _changelog(self, spark, rows):
        return spark.createDataFrame(
            [Row(k=k, ts=t, i=i, attr=a) for i, (k, t, a) in enumerate(rows)]
        )

    def test_consecutive_duplicates_collapse(self, spark):
        df = self._changelog(
            spark,
            [("u1", 1, "x"), ("u1", 2, "x"), ("u1", 3, "y"), ("u1", 4, "y"),
             ("u1", 5, "x")],
        )
        out = scd2_history(df, ["k"], "ts", "i", ["attr"]).orderBy("version").collect()
        assert [(r.valid_from, r.valid_to, r.attr, r.is_current) for r in out] == [
            (1, 3, "x", False),
            (3, 5, "y", False),
            (5, None, "x", True),
        ]
        assert [r.version for r in out] == [1, 2, 3]

    def test_null_transitions(self, spark):
        df = self._changelog(
            spark, [("u1", 1, None), ("u1", 2, None), ("u1", 3, "a"), ("u1", 4, None)]
        )
        out = scd2_history(df, ["k"], "ts", "i", ["attr"]).orderBy("version").collect()
        # NULL->NULL is no change; NULL->a and a->NULL are changes
        assert [(r.valid_from, r.attr) for r in out] == [(1, None), (3, "a"), (4, None)]

    def test_intervals_tile_without_gaps(self, spark):
        rows = [("u%d" % (i % 5), i, "s%d" % ((i * 7) % 3)) for i in range(200)]
        out = scd2_history(
            self._changelog(spark, rows), ["k"], "ts", "i", ["attr"]
        ).collect()
        by_key: dict[str, list] = {}
        for r in out:
            by_key.setdefault(r.k, []).append(r)
        for rows_k in by_key.values():
            rows_k.sort(key=lambda r: r.version)
            for prev, nxt in zip(rows_k, rows_k[1:]):
                assert prev.valid_to == nxt.valid_from
                assert not prev.is_current
            assert rows_k[-1].is_current and rows_k[-1].valid_to is None


class TestSketchArtifacts:
    def test_daily_artifact_roundtrip(self, spark, tmp_path):
        """The 100 TB workflow: persist one tiny register table per day,
        reload any subset later, merge, estimate — without rescanning
        facts. Round-tripping through parquet must not change a bit."""
        day1 = spark.range(0, 3000).selectExpr("id AS v")
        day2 = spark.range(2000, 6000).selectExpr("id AS v")
        r1, r2 = hll_registers(day1, "v"), hll_registers(day2, "v")
        p1, p2 = str(tmp_path / "d1"), str(tmp_path / "d2")
        r1.write.parquet(p1)
        r2.write.parquet(p2)
        merged = merge_registers(
            spark.read.parquet(p1), spark.read.parquet(p2)
        )
        direct = hll_registers(day1.union(day2), "v")
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, direct.collect())
        )
        est = hll_estimate(merged)
        assert abs(est - 6000) / 6000 < 0.20

    def test_cms_artifact_roundtrip(self, spark, tmp_path):
        a = spark.range(0, 2000).selectExpr("concat('t', id % 61) AS v")
        b = spark.range(0, 3000).selectExpr("concat('t', id % 47) AS v")
        pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
        cms_sketch(a, "v").write.parquet(pa)
        cms_sketch(b, "v").write.parquet(pb)
        merged = merge_cms(spark.read.parquet(pa), spark.read.parquet(pb))
        direct = cms_sketch(a.union(b), "v")
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, direct.collect())
        )


def test_true_range_and_atr_known_series(spark):
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.finance import (
        atr,
    )

    # one symbol, 4 bars; hand-computed Wilder true ranges
    rows = [
        ("S", 1, 12.0, 10.0, 11.0),   # first bar: tr = high-low = 2
        ("S", 2, 13.0, 11.5, 12.0),   # tr = max(1.5, |13-11|=2, |11.5-11|=.5) = 2
        ("S", 3, 11.0, 9.0, 10.0),    # tr = max(2, |11-12|=1, |9-12|=3) = 3
        ("S", 4, 10.5, 10.0, 10.2),   # tr = max(.5, .5, 0) = 0.5
    ]
    df = spark.createDataFrame(
        rows, "symbol string, t long, high double, low double, close double"
    )
    out = {
        r["t"]: r
        for r in atr(df, ["symbol"], "t", n=3).collect()
    }
    assert [out[t]["tr"] for t in (1, 2, 3, 4)] == [2.0, 2.0, 3.0, 0.5]
    # warm-up mean over bars seen so far, then 3-bar rolling mean
    assert out[1]["atr"] == 2.0
    assert out[2]["atr"] == 2.0
    assert round(out[3]["atr"], 6) == round(7.0 / 3, 6)
    assert round(out[4]["atr"], 6) == round(5.5 / 3, 6)


def test_pairwise_corr_perfect_and_anti(spark):
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.finance import (
        pairwise_corr,
    )

    # A and B move together, C moves opposite, D is constant (dropped)
    rows = []
    series = {"A": [0.01, -0.02, 0.03, 0.01], "B": [0.02, -0.04, 0.06, 0.02],
              "C": [-0.01, 0.02, -0.03, -0.01], "D": [0.0, 0.0, 0.0, 0.0]}
    for k, vals in series.items():
        for d, v in enumerate(vals):
            rows.append((k, d, v))
    df = spark.createDataFrame(rows, "sym string, trade_date long, ret double")
    out = {
        (r["key_a"], r["key_b"]): r["corr"]
        for r in pairwise_corr(df, "sym").collect()
    }
    assert out[("A", "B")] == 1.0
    assert out[("A", "C")] == -1.0
    assert out[("B", "C")] == -1.0
    assert not any("D" in k for k in out)  # zero variance -> dropped


from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.finance import (  # noqa: E402
    anchored_vwap,
    candle_patterns,
    on_balance_volume,
    returns_ledger,
    rolling_sharpe,
    stochastic_oscillator,
)


def _bars(spark, rows):
    """rows: (sym, t, open, high, low, close[, volume])"""
    out = []
    for r in rows:
        sym, t, o, h, lo, c = r[:6]
        v = r[6] if len(r) > 6 else 10
        out.append(
            Row(sym=sym, t=t, open=float(o), high=float(h), low=float(lo),
                close=float(c), volume=int(v))
        )
    return spark.createDataFrame(out)


class TestAnchoredVwap:
    def test_resets_at_anchor_boundary(self, spark):
        df = spark.createDataFrame(
            [
                Row(sym="A", day=1, ts=1, i=1, close=10.0, volume=2),
                Row(sym="A", day=1, ts=2, i=2, close=20.0, volume=2),
                Row(sym="A", day=2, ts=3, i=3, close=100.0, volume=1),
            ]
        )
        out = {
            r.ts: (r.vwap, r.cum_volume)
            for r in anchored_vwap(
                df, ["sym"], "day", "ts", "i", "close", "volume"
            ).collect()
        }
        assert out[1] == (10.0, 2)
        assert out[2] == (15.0, 4)  # (20+40)/4
        assert out[3] == (100.0, 1)  # day-2 anchor resets the fold


class TestStochastic:
    def test_flat_window_is_null_and_d_averages(self, spark):
        df = _bars(
            spark,
            [
                ("A", 1, 5, 5, 5, 5),       # flat: %K NULL
                ("A", 2, 5, 10, 0, 10),     # %K = 100
                ("A", 3, 5, 10, 0, 5),      # range [0,10] over window: %K = 50
            ],
        )
        out = {r.t: r for r in stochastic_oscillator(df, ["sym"], "t", n=2, d=2).collect()}
        assert out[1].pct_k is None
        assert out[1].pct_d is None  # no non-null %K yet
        assert out[2].pct_k == pytest.approx(100.0)
        assert out[2].pct_d == pytest.approx(100.0)  # averages the one non-null
        assert out[3].pct_k == pytest.approx(50.0)
        assert out[3].pct_d == pytest.approx(75.0)


class TestOBV:
    def test_signed_cumulative_integer_ledger(self, spark):
        df = _bars(
            spark,
            [
                ("A", 1, 0, 0, 0, 10, 5),
                ("A", 2, 0, 0, 0, 12, 3),   # up: +3
                ("A", 3, 0, 0, 0, 11, 7),   # down: -7
                ("A", 4, 0, 0, 0, 11, 9),   # flat: 0
                ("B", 1, 0, 0, 0, 1, 4),    # other key independent
            ],
        )
        out = {(r.sym, r.t): r.obv for r in on_balance_volume(df, ["sym"], "t").collect()}
        assert out[("A", 1)] == 0
        assert out[("A", 2)] == 3
        assert out[("A", 3)] == -4
        assert out[("A", 4)] == -4
        assert out[("B", 1)] == 0


class TestReturnsLedger:
    def test_cum_ret_divides_by_first_close(self, spark):
        df = _bars(spark, [("A", 1, 0, 0, 0, 10), ("A", 2, 0, 0, 0, 15), ("A", 3, 0, 0, 0, 12)])
        out = {r.t: r for r in returns_ledger(df, ["sym"], "t").collect()}
        assert out[1].ret is None and out[1].cum_ret == 0.0
        assert out[2].ret == pytest.approx(0.5)
        assert out[2].cum_ret == pytest.approx(0.5)
        assert out[3].ret == pytest.approx(-0.2)
        assert out[3].cum_ret == pytest.approx(0.2)  # 12/10 - 1

    def test_non_positive_closes_excluded(self, spark):
        df = _bars(spark, [("A", 1, 0, 0, 0, 10), ("A", 2, 0, 0, 0, -1)])
        rows = returns_ledger(df, ["sym"], "t").collect()
        assert [r.t for r in rows] == [1]


class TestRollingSharpe:
    def test_known_window_and_winsorize(self, spark):
        df = spark.createDataFrame(
            [
                Row(sym="A", t=1, ret=0.1),
                Row(sym="A", t=2, ret=0.3),
                Row(sym="A", t=3, ret=50.0),  # winsorized out (cap 10)
            ]
        )
        out = {r.t: r.sharpe for r in rolling_sharpe(df, ["sym"], "t", n=20).collect()}
        assert 3 not in out  # capped row dropped entirely
        assert out[1] is None  # min_obs
        # mean 0.2, sample std of (0.1, 0.3) = sqrt(0.02) -> sharpe = 0.2/sqrt(0.02)
        assert out[2] == pytest.approx(0.2 / (0.02 ** 0.5))

    def test_zero_variance_is_null(self, spark):
        df = spark.createDataFrame(
            [Row(sym="A", t=1, ret=0.1), Row(sym="A", t=2, ret=0.1)]
        )
        out = rolling_sharpe(df, ["sym"], "t", n=20).collect()
        assert all(r.sharpe is None for r in out)


class TestCandlePatterns:
    def test_flags(self, spark):
        df = _bars(
            spark,
            [
                # doji: body 0.1 <= 0.1 * range(2.0)
                ("A", 1, 10.0, 11.0, 9.0, 10.1),
                # bearish bar then bullish engulfing of it
                ("B", 1, 10.0, 10.2, 9.4, 9.5),
                ("B", 2, 9.4, 10.6, 9.3, 10.5),
                # hammer: open 10, close 10.2, low 9 (lower 1.0 >= 2*0.2), high 10.25
                ("C", 1, 10.0, 10.25, 9.0, 10.2),
            ],
        )
        out = {(r.sym, r.t): r for r in candle_patterns(df, ["sym"], "t").collect()}
        assert out[("A", 1)].is_doji
        assert not out[("B", 1)].is_bullish_engulfing  # first bar: no prior
        assert out[("B", 2)].is_bullish_engulfing
        assert not out[("B", 2)].is_bearish_engulfing
        assert out[("C", 1)].is_hammer
        assert not out[("C", 1)].is_shooting_star


class TestSmaCrossoverBacktest:
    def test_hand_built_crossover(self, spark):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.finance import (
            sma_crossover_backtest,
        )

        closes = [10.0, 10.0, 10.0, 40.0, 40.0, 80.0]
        df = spark.createDataFrame(
            [Row(sym="A", t=i + 1, close=c) for i, c in enumerate(closes)]
        )
        r = sma_crossover_backtest(
            df, ["sym"], "t", fast=2, slow=3
        ).collect()[0]
        # sig turns 1 at t=4 (sma2=25 > sma3=20); position from t=5
        assert r.n_days == 5          # returns defined t2..t6
        assert r.n_trades == 1        # one 0->1 flip
        assert r.n_positioned == 2    # held t5, t6
        assert r.n_wins == 1          # t6 doubled; t5 flat
        assert r.total_return == pytest.approx(1.0)  # +100% on t6, 0% on t5
        assert r.hit_rate == pytest.approx(0.5)

    def test_never_positioned_null_hit_rate(self, spark):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.finance import (
            sma_crossover_backtest,
        )

        # monotonically falling: fast sma never exceeds slow sma
        df = spark.createDataFrame(
            [Row(sym="A", t=i + 1, close=100.0 - 10 * i) for i in range(6)]
        )
        r = sma_crossover_backtest(df, ["sym"], "t", fast=2, slow=3).collect()[0]
        assert r.n_positioned == 0 and r.hit_rate is None
        assert r.total_return == 0.0


class TestRollingHll:
    def test_rolling_merge_equals_direct_window_sketch(self, spark):
        """Merge law along time: exploding daily registers to target days
        and taking max == building the sketch over each window's raw
        values directly."""
        from pyspark.sql import functions as F
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.sketch import (
            hll_daily_registers,
            hll_registers,
            hll_rolling_merge,
        )

        df = spark.createDataFrame(
            [(d, f"u{(d * 7 + i) % 23}") for d in range(10) for i in range(5)],
            "day long, user string",
        )
        daily = hll_daily_registers(df, "user", "day", p=4)
        rolled = {
            (r["day"], r["bucket"]): r["r"]
            for r in hll_rolling_merge(daily, window_days=3).collect()
        }
        for target in range(10):
            window = df.filter(
                (F.col("day") >= target - 2) & (F.col("day") <= target)
            )
            direct = {
                r["bucket"]: r["r"]
                for r in hll_registers(window, "user", p=4).collect()
            }
            got = {b: r for (d, b), r in rolled.items() if d == target}
            assert got == direct, f"day {target}"

    def test_estimate_cols_accuracy(self, spark):
        from pyspark.sql import functions as F
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.sketch import (
            hll_estimate,
            hll_estimate_cols,
            hll_registers,
        )

        df = spark.createDataFrame(
            [(f"user_{i}",) for i in range(500)], "u string"
        )
        regs = hll_registers(df, "u", p=8)
        n_present, z_num = (
            regs.agg(*hll_estimate_cols(p=8)).collect()[0]
        )
        # exact-integer z reproduces the driver-side float estimator
        m = 256
        z = z_num / float(1 << 53) + (m - n_present) * 1.0
        raw = (0.7213 / (1 + 1.079 / m)) * m * m / z
        est = hll_estimate(regs, p=8)
        if raw > 2.5 * m:  # outside linear-counting range: must agree
            assert abs(raw - est) / est < 1e-9
        assert abs(est - 500) / 500 < 0.15


class TestKeltnerChannels:
    def test_mid_is_rolling_mean_of_typical_price(self, spark):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.finance import (
            keltner_channels,
        )

        rows = [
            ("A", d, 10.0 + d, 12.0 + d, 9.0 + d, 11.0 + d)
            for d in range(1, 8)
        ]
        df = spark.createDataFrame(
            rows, "sym string, d long, open double, high double, low double, close double"
        )
        out = {
            r["d"]: r
            for r in keltner_channels(df, ["sym"], "d", n=3, m=2, mult=2.0).collect()
        }
        # tp for bar d: (12+d + 9+d + 11+d)/3
        tps = {d: (12.0 + d + 9.0 + d + 11.0 + d) / 3.0 for d in range(1, 8)}
        assert out[1]["kc_mid"] == pytest.approx(tps[1])
        assert out[4]["kc_mid"] == pytest.approx((tps[2] + tps[3] + tps[4]) / 3)
        # band symmetry: upper - mid == mid - lower
        for r in out.values():
            assert (r["kc_upper"] - r["kc_mid"]) == pytest.approx(
                r["kc_mid"] - r["kc_lower"]
            )
        # first bar TR = high - low = 3; second bar prev_close=12 ->
        # TR = max(3, |13-12|, |10-12|) = 3 -> band = 2 * 3 = 6
        assert out[2]["kc_upper"] - out[2]["kc_mid"] == pytest.approx(6.0)


class TestHeikinAshi:
    def test_recurrence_and_partition_invariance(self, spark):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.finance import (
            heikin_ashi,
        )

        rows = [
            ("A", 1, 10.0, 12.0, 9.0, 11.0),
            ("A", 2, 11.0, 15.0, 10.0, 14.0),
            ("A", 3, 14.0, 16.0, 13.0, 13.5),
            ("B", 1, 100.0, 101.0, 99.0, 100.5),
        ]
        df = spark.createDataFrame(
            rows, "sym string, d long, open double, high double, low double, close double"
        )
        out = {
            (r["sym"], r["d"]): r
            for r in heikin_ashi(df, ["sym"], "d").collect()
        }
        a1 = out[("A", 1)]
        assert a1["ha_close"] == pytest.approx((10 + 12 + 9 + 11) / 4)
        assert a1["ha_open"] == pytest.approx((10 + 11) / 2)
        a2 = out[("A", 2)]
        # ha_open_2 = (ha_open_1 + ha_close_1)/2 = (10.5 + 10.5)/2
        assert a2["ha_open"] == pytest.approx(10.5)
        assert a2["ha_close"] == pytest.approx((11 + 15 + 10 + 14) / 4)
        assert a2["ha_high"] == pytest.approx(15.0)  # max(h, ha_o, ha_c)
        a3 = out[("A", 3)]
        assert a3["ha_open"] == pytest.approx((10.5 + 12.5) / 2)
        # independent keys: B seeds fresh
        assert out[("B", 1)]["ha_open"] == pytest.approx((100 + 100.5) / 2)
        # partition invariance: the fold sees each group whole
        again = {
            (r["sym"], r["d"]): r["ha_open"]
            for r in heikin_ashi(df.repartition(7), ["sym"], "d").collect()
        }
        assert {k: v["ha_open"] for k, v in out.items()} == again


class TestSemDedup:
    def test_within_cluster_duplicates_get_one_keeper(self, spark):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.similarity import (
            semdedup,
        )

        # two tight groups far apart + noise; exact duplicates inside
        # each group must collapse onto the group-minimum id
        import random

        rng = random.Random(3)
        rows = []
        for i in range(8):  # group 1: near (1, 0, 0, ...)
            base = [1.0, 0.0, 0.0, 0.0]
            rows.append((i, [v + rng.uniform(-0.01, 0.01) for v in base]))
        for i in range(8, 16):  # group 2: near (0, 1, 0, ...)
            base = [0.0, 1.0, 0.0, 0.0]
            rows.append((i, [v + rng.uniform(-0.01, 0.01) for v in base]))
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = {
            r["vec_id"]: r
            for r in semdedup(df, threshold=0.99, n_lists=2, n_iter=2).collect()
        }
        assert out, "expected near-dup rows"
        # every listed vector's keeper is the min id of its group side
        for vid, r in out.items():
            assert r["keeper_id"] <= vid
            assert (vid < 8) == (r["keeper_id"] < 8)  # no cross-group merge
            assert r["is_kept"] == (vid == r["keeper_id"])
        # the BLAS per-cell GEMM scorer must agree with the fold scorer
        # away from threshold boundaries
        blas = {
            r["vec_id"]: (r["keeper_id"], r["is_kept"])
            for r in semdedup(
                df, threshold=0.99, n_lists=2, n_iter=2, scorer="blas"
            ).collect()
        }
        assert blas == {k: (r["keeper_id"], r["is_kept"]) for k, r in out.items()}

    def test_hot_cell_split_guard_preserves_exact_dups(self, spark):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.similarity import (
            _split_hot_cells,
            semdedup,
        )

        # ONE mega-cluster of exact duplicates (every vector identical up
        # to a tiny unique perturbation in dim 3) — a single k-means cell
        # swallows all of them. max_cell_size forces a hyperplane split;
        # exact duplicates share hyperplane bits, so dedup still finds
        # the whole group inside one sub-cell.
        rows = [(i, [1.0, 0.5, 0.0, 0.0]) for i in range(40)]
        rows += [(100 + i, [-1.0, 0.4 + i * 0.1, 0.3, 0.0]) for i in range(4)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = {
            r["vec_id"]: r
            for r in semdedup(
                df, threshold=0.999, n_lists=2, n_iter=1,
                max_cell_size=10, dim=4,
            ).collect()
        }
        dup_ids = {i for i in range(40)}
        assert dup_ids <= set(out), "split guard dropped exact duplicates"
        for vid in dup_ids:
            assert out[vid]["keeper_id"] == 0
        # and the split itself actually bounds cell populations for
        # identical-direction vectors is impossible (same bits by
        # construction), so assert the re-keying ran: cells must be
        # re-scaled keys (multiples of 2^B), disjoint from raw ids
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.similarity import (
            ivf_index,
        )

        _, asg = ivf_index(df, n_lists=2, n_iter=1)
        split = _split_hot_cells(asg, max_cell_size=10, dim=4)
        sizes = {r["cell"]: r["n"] for r in split.groupBy("cell").agg(
            F.count(F.lit(1)).alias("n")).collect()}
        assert len(sizes) >= 2  # the hot cell was re-keyed into sub-cells

    def test_split_guard_oracle_parity_on_testdata(self, spark):
        """The guard is ON by default (max_cell_size=4096), which the
        gate SFs never trigger — so pin the SPLIT-ENGAGED oracle replay
        here: max_cell_size=32 on the real sf0.001 embeddings (500
        vectors / 8 cells ~ 62 each -> every cell splits) must be
        row-identical between Spark semdedup and _semdedup_sql."""
        import duckdb

        from __spark_entry__ import _semdedup_sql
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.similarity import (
            semdedup,
        )
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.sources.tables import (
            load_table,
        )

        sf = "/root/testdata/sf0.001"
        emb = load_table(spark, sf, "embeddings")
        out = semdedup(
            emb, threshold=0.4, n_lists=8, n_iter=2, max_cell_size=32
        ).orderBy("vec_id")
        srows = [(r[0], r[1], r[2]) for r in out.collect()]
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS"
            f" SELECT * FROM '{sf}/embeddings.parquet'"
        )
        drows = [
            tuple(r)
            for r in con.execute(
                _semdedup_sql(threshold=0.4, max_cell_size=32)
            ).fetchall()
        ]
        assert srows == drows
        assert len(srows) > 0
        # and the split genuinely changed the pair set vs unguarded
        unsplit = semdedup(
            emb, threshold=0.4, n_lists=8, n_iter=2, max_cell_size=None
        )
        assert unsplit.count() != len(srows)


class TestSupertrend:
    def test_state_machine_and_warmup(self, spark):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.finance import (
            supertrend,
        )

        # 20 bars: a steady rise then a sharp crash — the trend must
        # flip down when close crosses the ratcheted lower band
        rows = []
        px = 100.0
        for d in range(20):
            px = px + 2 if d < 12 else px * 0.9
            rows.append(("A", d, px + 1.0, px - 1.0, px))
        df = spark.createDataFrame(
            rows, "sym string, d long, high double, low double, close double"
        )
        out = {r["d"]: r for r in supertrend(df, ["sym"], "d", n=5, mult=3).collect()}
        # warm-up: first n-1 bars have NULL indicator values
        for d in range(4):
            assert out[d]["atr"] is None and out[d]["trend"] is None
        assert out[4]["atr"] is not None
        # rising segment holds an uptrend; deep crash flips it down
        assert out[10]["trend"] == 1
        assert out[19]["trend"] == -1
        # the active band is the reported supertrend line
        for d in range(4, 20):
            r = out[d]
            band = r["st_lower"] if r["trend"] == 1 else r["st_upper"]
            assert r["supertrend"] == band
        # partition invariance: the fold sees each group whole
        again = {
            r["d"]: r["trend"]
            for r in supertrend(
                df.repartition(7), ["sym"], "d", n=5, mult=3
            ).collect()
        }
        assert {d: r["trend"] for d, r in out.items()} == again


class TestBloom:
    def test_no_false_negatives_and_merge_law(self, spark):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.sketch import (
            bloom_might_contain,
            bloom_sketch,
            merge_bloom,
        )

        a = spark.createDataFrame(
            [(f"doc-{i}",) for i in range(50)], "text string"
        )
        b = spark.createDataFrame(
            [(f"doc-{i}",) for i in range(50, 100)], "text string"
        )
        sk_a, sk_b = bloom_sketch(a, "text"), bloom_sketch(b, "text")
        merged = merge_bloom(sk_a, sk_b)
        # merge law: OR-merge == filter built over the union
        union_sk = bloom_sketch(a.unionByName(b), "text")
        got = {r["word"]: r["bits"] for r in merged.collect()}
        want = {r["word"]: r["bits"] for r in union_sk.collect()}
        assert got == want
        # no false negatives: every inserted value probes true
        probes = a.unionByName(b).select(
            F.col("text").alias("probe_id"), "text"
        )
        rows = bloom_might_contain(
            merged, probes, "text", id_cols=["probe_id"]
        ).collect()
        assert all(r["in_filter"] for r in rows)

    def test_absent_values_mostly_miss_and_size_is_bounded(self, spark):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.sketch import (
            bloom_might_contain,
            bloom_sketch,
        )

        corpus = spark.createDataFrame(
            [(f"doc-{i}",) for i in range(200)], "text string"
        )
        sk = bloom_sketch(corpus, "text")
        # the sketch contract: row count bounded by m/32, not input size
        assert sk.count() <= (1 << 20) // 32
        absent = spark.createDataFrame(
            [(f"other-{i}",) for i in range(200)], "text string"
        )
        rows = bloom_might_contain(
            sk, absent.select(F.col("text").alias("probe_id"), "text"),
            "text", id_cols=["probe_id"],
        ).collect()
        # fp odds ~(1-e^{-kn/m})^k ~ 1e-15 at n=200, m=2^20: all miss
        assert all(not r["in_filter"] for r in rows)


def test_bloom_probe_is_duplicate_safe_and_requires_ids(spark):
    """A probe id appearing twice must NOT flip a present value to a
    false negative (the min-of-hits form); omitting id_cols is an error,
    not a silent global AND."""
    import pytest

    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.sketch import (
        bloom_might_contain,
        bloom_sketch,
    )

    corpus = spark.createDataFrame([("alpha",), ("beta",)], "text string")
    sk = bloom_sketch(corpus, "text")
    dup_probes = spark.createDataFrame(
        [(1, "alpha"), (1, "alpha"), (2, "missing")],
        "probe_id long, text string",
    )
    rows = {
        r["probe_id"]: r["in_filter"]
        for r in bloom_might_contain(
            sk, dup_probes, "text", id_cols=["probe_id"]
        ).collect()
    }
    assert rows[1] is True and rows[2] is False
    with pytest.raises(ValueError):
        bloom_might_contain(sk, dup_probes, "text")
