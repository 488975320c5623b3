"""Unit tests for the round-6 indicator batch (operators/finance.py):
Chaikin Money Flow, Awesome Oscillator, Detrended Price Oscillator,
VWMA, and the Calmar ratio — plus the Gopher rule screen
(operators/text.py) and the PCA-whitened outlier scorer
(operators/similarity.py). Each pins hand-checked math on tiny inputs
plus the edge conventions the SQL oracles replay (flat-bar CMF, slow
warm-up AO, capped-return drop in Calmar, vacuous line rules)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.finance import (
    awesome_oscillator,
    calmar_ratio,
    chaikin_money_flow,
    detrended_price_osc,
    vwma,
)


def _bars(spark, rows):
    """rows: (sym, t, high, low, close, volume)"""
    return spark.createDataFrame(
        [
            Row(
                sym=s,
                t=t,
                high=float(h),
                low=float(lo),
                close=float(c),
                volume=int(v),
            )
            for (s, t, h, lo, c, v) in rows
        ]
    )


class TestChaikinMoneyFlow:
    def test_close_at_high_gives_plus_one(self, spark):
        # close == high, low < high -> mfm = +1 every bar -> cmf = 1
        df = _bars(spark, [("a", t, 10.0, 9.0, 10.0, 5) for t in range(4)])
        out = chaikin_money_flow(df, ["sym"], "t", n=3).collect()
        for r in out:
            assert r["cmf"] == pytest.approx(1.0, abs=1e-6)

    def test_flat_bar_zero_flow_but_volume_counts(self, spark):
        # bar 0: mfm=+1, vol 10; bar 1: FLAT (h==l), vol 30 -> cmf at
        # t=1 is (1e6*10 + 0*30)/(40*1e6) = 0.25
        df = _bars(
            spark,
            [("a", 0, 10.0, 9.0, 10.0, 10), ("a", 1, 5.0, 5.0, 5.0, 30)],
        )
        out = {r["t"]: r["cmf"] for r in chaikin_money_flow(
            df, ["sym"], "t", n=5).collect()}
        assert out[0] == pytest.approx(1.0, abs=1e-9)
        assert out[1] == pytest.approx(0.25, abs=1e-9)


class TestAwesomeOscillator:
    def test_constant_midpoint_zero_after_warmup(self, spark):
        df = _bars(
            spark, [("a", t, 11.0, 9.0, 10.0, 1) for t in range(40)]
        )
        out = {r["t"]: r["ao"] for r in awesome_oscillator(
            df, ["sym"], "t").collect()}
        assert out[10] is None  # slow window not full
        assert out[33] == pytest.approx(0.0, abs=1e-9)
        assert out[39] == pytest.approx(0.0, abs=1e-9)

    def test_linear_midpoint_constant_gap(self, spark):
        # mp = t -> SMA5 mean of last 5 = t-2; SMA34 = t-16.5
        # ao = 14.5 once the slow window is full
        df = _bars(
            spark,
            [("a", t, t + 1.0, t - 1.0, float(t), 1) for t in range(50)],
        )
        out = {r["t"]: r["ao"] for r in awesome_oscillator(
            df, ["sym"], "t").collect()}
        assert out[40] == pytest.approx(14.5, abs=1e-6)


class TestDetrendedPriceOsc:
    def test_linear_series_constant_dpo(self, spark):
        # close = 100 + t: SMA20[t] = 100 + t - 9.5, lag11 = 100 + t - 11
        # dpo = -1.5 once both exist
        df = _bars(
            spark,
            [("a", t, 0, 0, 100.0 + t, 1) for t in range(40)],
        )
        out = {r["t"]: r["dpo"] for r in detrended_price_osc(
            df, ["sym"], "t", n=20).collect()}
        assert out[10] is None
        assert out[35] == pytest.approx(-1.5, abs=1e-6)

    def test_partition_invariance(self, spark):
        df = _bars(
            spark,
            [("a", t, 0, 0, 100.0 + (t * 7) % 13, 1) for t in range(30)],
        )
        a = {r["t"]: r["dpo"] for r in detrended_price_osc(
            df.coalesce(1), ["sym"], "t").collect()}
        b = {r["t"]: r["dpo"] for r in detrended_price_osc(
            df.repartition(8), ["sym"], "t").collect()}
        assert a == b


class TestVwma:
    def test_weights_heavy_volume_bar(self, spark):
        # closes 10 (vol 1) and 20 (vol 3) -> vwma = (10+60)/4 = 17.5
        df = _bars(
            spark,
            [("a", 0, 0, 0, 10.0, 1), ("a", 1, 0, 0, 20.0, 3)],
        )
        out = {r["t"]: r["vwma"] for r in vwma(
            df, ["sym"], "t", n=5).collect()}
        assert out[0] == pytest.approx(10.0, abs=1e-9)
        assert out[1] == pytest.approx(17.5, abs=1e-9)


class TestCalmarRatio:
    def _events(self, spark, closes, sym="u"):
        import datetime as dt

        rows = [
            Row(
                user_id=sym,
                event_id=i,
                ts=dt.datetime(2024, 1, 1) + dt.timedelta(days=i),
                value=float(c),
            )
            for i, c in enumerate(closes)
        ]
        return spark.createDataFrame(rows)

    def test_known_drawdown_and_annualized_return(self, spark):
        # 100 -> 110 -> 88 -> 99: mdd = 88/110 - 1 = -0.2
        closes = [100.0, 110.0, 88.0, 99.0]
        # pad with flat days so n_days >= 30
        closes += [99.0] * 40
        df = self._events(spark, closes)
        r = calmar_ratio(df, ["user_id"], "ts", "event_id", "value").collect()[0]
        assert r["mdd"] == pytest.approx(-0.2, abs=1e-9)
        n = r["n_days"]
        mean_ret = r["ann_ret"] / 252.0
        # mean of quantized daily returns: 0.1, -0.2, 0.125, then zeros
        assert mean_ret == pytest.approx((0.1 - 0.2 + 0.125) / n, abs=1e-6)
        assert r["calmar"] == pytest.approx(r["ann_ret"] / 0.2, rel=1e-9)

    def test_capped_rows_dropped_and_min_days(self, spark):
        # a >1000% jump is dropped from returns but still shapes the
        # drawdown ledger; few days -> calmar NULL
        closes = [1.0, 20.0, 10.0]
        r = calmar_ratio(
            self._events(spark, closes), ["user_id"], "ts", "event_id",
            "value", min_days=2,
        ).collect()[0]
        assert r["n_days"] == 1  # the 19.0 return was dropped
        assert r["mdd"] == pytest.approx(0.5 - 1.0, abs=1e-9)
        assert r["calmar"] is None  # n_days < min_days


class TestChoppinessIndex:
    def test_straight_trend_is_low_flat_is_null(self, spark):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.finance import (
            choppiness_index,
        )

        # perfect staircase: each bar spans [t, t+1] — path length equals
        # net range -> ratio n/(n) ... TR=1/bar, sum=14, range=14 ->
        # log10(1)=0 -> chop = 0
        trend = [Row(sym="a", t=t, high=float(t + 1), low=float(t),
                     close=float(t + 1)) for t in range(20)]
        # flat bars: high==low==close -> range 0 -> NULL
        flat = [Row(sym="b", t=t, high=5.0, low=5.0, close=5.0)
                for t in range(20)]
        df = spark.createDataFrame(trend + flat)
        out = {(r["sym"], r["t"]): r["chop"] for r in choppiness_index(
            df, ["sym"], "t", n=14).collect()}
        assert out[("a", 19)] == pytest.approx(0.0, abs=1e-6)
        assert out[("a", 5)] is None  # warm-up
        assert out[("b", 19)] is None  # zero range

    def test_chop_bounded_and_higher_for_oscillation(self, spark):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.finance import (
            choppiness_index,
        )

        # oscillating within a band: path length >> net range -> high chop
        rows = [Row(sym="a", t=t, high=10.0 + (t % 2), low=9.0 + (t % 2),
                    close=9.5 + (t % 2)) for t in range(20)]
        df = spark.createDataFrame(rows)
        out = [r["chop"] for r in choppiness_index(
            df, ["sym"], "t", n=14).collect() if r["chop"] is not None]
        assert out and all(60.0 < c <= 100.0 for c in out)


class TestChandelierExit:
    def test_exits_trail_extremes_by_atr_multiple(self, spark):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.finance import (
            chandelier_exit,
        )

        # constant bars: high 11, low 9, close 10 -> tr = 2 every bar,
        # atr = 2, hh = 11, ll = 9 -> long 11 - 6 = 5, short 9 + 6 = 15
        df = spark.createDataFrame(
            [
                Row(sym="a", t=t, high=11.0, low=9.0, close=10.0)
                for t in range(10)
            ]
        )
        out = chandelier_exit(df, ["sym"], "t", n=5, mult=3.0).collect()
        for r in out:
            assert r["long_exit"] == pytest.approx(5.0, abs=1e-9)
            assert r["short_exit"] == pytest.approx(15.0, abs=1e-9)

    def test_spike_sets_extreme_window(self, spark):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.finance import (
            chandelier_exit,
        )

        rows = [Row(sym="a", t=t, high=11.0, low=9.0, close=10.0)
                for t in range(6)]
        rows[3] = Row(sym="a", t=3, high=20.0, low=9.0, close=10.0)
        df = spark.createDataFrame(rows)
        out = {r["t"]: r for r in chandelier_exit(
            df, ["sym"], "t", n=5, mult=3.0).collect()}
        # at t=4 the 5-bar high is the 20.0 spike
        assert out[4]["long_exit"] == pytest.approx(
            20.0 - 3.0 * out[4]["atr"], abs=1e-9
        )


class TestRenkoBricks:
    def test_hand_worked_brick_sequence(self, spark):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.finance import (
            renko_bricks,
        )

        # first close 100 -> b = 100e6 * 50 // 10000 = 0.5 price units
        # band starts [100.0, 100.5]
        closes = [
            (0, 100.0, 0, 0),    # init: band [100.0, 100.5]
            (1, 100.4, 0, 0),    # inside band+b -> no brick
            (2, 101.6, 2, 1),    # >= 101.0: n=(101.6-100.5)//0.5=2 -> [101.0,101.5]
            (3, 101.2, 0, 1),    # no reversal (needs <= 100.5)
            (4, 100.0, 0 - 2, -1),  # <= 100.5: n=(101.0-100.0)//0.5=2 -> [100.0,100.5]
        ]
        df = spark.createDataFrame(
            [Row(sym="a", t=t, close=c) for (t, c, _, _) in closes]
        )
        out = {
            r["t"]: r
            for r in renko_bricks(df, ["sym"], "t").collect()
        }
        for (t, _, nb, d) in closes:
            assert out[t]["n_bricks"] == nb, t
            assert out[t]["dir"] == d, t
        assert out[0]["brick_lo"] == pytest.approx(100.0)
        assert out[2]["brick_hi"] == pytest.approx(101.5)
        assert out[4]["brick_lo"] == pytest.approx(100.0)

    def test_partition_invariance_and_positive_only(self, spark):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.finance import (
            renko_bricks,
        )

        rows = [
            Row(sym="a", t=t, close=float(100 + ((t * 13) % 7) - 3))
            for t in range(40)
        ] + [Row(sym="a", t=99, close=-5.0)]  # dropped
        df = spark.createDataFrame(rows)
        a = [
            (r["t"], r["n_bricks"], r["dir"])
            for r in renko_bricks(df.coalesce(1), ["sym"], "t")
            .orderBy("t").collect()
        ]
        b = [
            (r["t"], r["n_bricks"], r["dir"])
            for r in renko_bricks(df.repartition(8), ["sym"], "t")
            .orderBy("t").collect()
        ]
        assert a == b
        assert all(t != 99 for (t, _, _) in a)


class TestGopherRules:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
        )

    def test_rule_metrics_and_verdicts(self, spark):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.text import (
            gopher_rules,
        )

        good = "the quick brown fox jumps over a lazy dog " * 10  # 90 words
        short = "too few words here"
        hashy = ("word " * 60) + "#" * 30
        bullets = "\n".join(f"- item {i}" for i in range(20))
        out = {
            r["doc_id"]: r
            for r in gopher_rules(
                self._docs(spark, [good, short, hashy, bullets, ""])
            ).collect()
        }
        assert out[0]["pass_gopher"] is True
        assert out[0]["n_words"] == 90
        assert out[0]["alpha_frac"] == pytest.approx(1.0)
        assert out[1]["pass_gopher"] is False  # word floor
        assert out[2]["hash_ratio"] == pytest.approx(30 / 61)
        assert out[2]["pass_gopher"] is False  # hash ratio
        assert out[3]["bullet_frac"] == pytest.approx(1.0)
        assert out[3]["pass_gopher"] is False  # bullets + word floor
        assert out[4]["n_words"] == 0
        assert out[4]["mean_word_len"] is None
        assert out[4]["pass_gopher"] is False

    def test_line_rules_vacuous_without_lines(self, spark):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.text import (
            gopher_rules,
        )

        one_line = "alpha beta " * 30  # no newline: 1 line, no bullets
        r = gopher_rules(self._docs(spark, [one_line])).collect()[0]
        assert r["bullet_frac"] == pytest.approx(0.0)
        assert r["pass_gopher"] is True


class TestParetoGini:
    def test_hand_computed_on_crafted_totals(self, spark):
        """Drive the registered queries through a scratch parquet dir
        with known per-user totals: equal totals -> gini 0; one user
        holding 10/13 of value -> hand-computed gini and top-10% share."""
        import datetime as dt
        import tempfile

        import __spark_entry__ as E

        def events_df(totals):
            rows = [
                Row(
                    event_id=i,
                    ts=dt.datetime(2024, 1, 1, 1 + i),
                    user_id=i,
                    event_type="view",
                    value=float(v),
                    props="{}",
                )
                for i, v in enumerate(totals)
            ]
            return spark.createDataFrame(rows)

        with tempfile.TemporaryDirectory() as td:
            events_df([1.0, 1.0, 1.0, 1.0]).write.parquet(td + "/events.parquet")
            g = E.e_gini(spark, td).collect()[0]
            assert g["gini"] == pytest.approx(0.0, abs=1e-12)
            p = E.e_pareto_share(spark, td).collect()[0]
            assert p["k_top"] == 1
            assert p["pareto_share"] == pytest.approx(0.25, abs=1e-12)

        with tempfile.TemporaryDirectory() as td:
            events_df([1.0, 1.0, 1.0, 10.0]).write.parquet(td + "/events.parquet")
            g = E.e_gini(spark, td).collect()[0]
            # sorted asc [1,1,1,10]: G = 2*(1+2+3+40)/(4*13) - 5/4
            assert g["gini"] == pytest.approx(2 * 46 / 52 - 1.25, abs=1e-12)
            p = E.e_pareto_share(spark, td).collect()[0]
            assert p["pareto_share"] == pytest.approx(10 / 13, abs=1e-12)


class TestPcaOutliers:
    def test_planted_outlier_ranks_first(self, spark):
        import numpy as np

        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.similarity import (
            pca_outlier_scores,
        )

        rng = np.random.default_rng(11)
        x = rng.normal(size=(80, 6)) * 0.1
        x[7] = np.array([8.0, -8.0, 8.0, -8.0, 8.0, -8.0])  # far out
        df = spark.createDataFrame(
            [
                Row(vec_id=i, embedding=[float(v) for v in row])
                for i, row in enumerate(x)
            ]
        )
        out = pca_outlier_scores(df, k=3, top=5).collect()
        assert out[0]["vec_id"] == 7
        assert out[0]["rank"] == 1
        assert out[0]["score"] > out[1]["score"]
        assert [r["rank"] for r in out] == [1, 2, 3, 4, 5]


class TestPcaRankDeficiency:
    def test_usable_eigenpairs_filters_noise(self):
        import numpy as np
        import pytest as _pt

        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.similarity import (
            usable_eigenpairs,
        )

        comps = np.eye(4)
        evals = np.array([2.0, 1.0, 1e-15, -1e-16])
        c2, e2 = usable_eigenpairs(comps, evals)
        assert list(e2) == [2.0, 1.0] and c2.shape == (2, 4)
        with _pt.raises(ValueError):
            usable_eigenpairs(comps, np.array([0.0, -1.0]))

    def test_outlier_scores_finite_when_k_exceeds_rank(self, spark):
        """Vectors living in a 2-D subspace of a 6-D space: k=5 exceeds
        the covariance's effective rank. Without the eigenvalue guard
        the proj^2/lambda terms are inf/NaN and flood the top-k (NaN
        sorts above every real in both engines); with it the scores are
        finite and the planted outlier still ranks first."""
        import math

        import numpy as np

        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.similarity import (
            pca_outlier_scores,
        )

        rng = np.random.default_rng(5)
        base = rng.normal(size=(60, 2)) * 0.2
        x = np.zeros((60, 6))
        x[:, 0] = base[:, 0]
        x[:, 3] = base[:, 1]
        x[11, 0] = 9.0
        x[11, 3] = -9.0
        df = spark.createDataFrame(
            [
                Row(vec_id=i, embedding=[float(v) for v in row])
                for i, row in enumerate(x)
            ]
        )
        out = pca_outlier_scores(df, k=5, top=5).collect()
        assert out[0]["vec_id"] == 11
        assert all(math.isfinite(r["score"]) for r in out)


class TestTsiPpoQstickRvi:
    def test_tsi_reference_fold(self, spark):
        """Hand-replay of the nested integer fold on a short series."""
        import math

        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.finance import (
            tsi,
        )

        closes = [10.0, 11.0, 10.5, 12.0, 12.5, 11.0, 13.0]
        df = spark.createDataFrame(
            [(1, i, c) for i, c in enumerate(closes)],
            "user_id long, d long, close double",
        )
        out = {r["d"]: r["tsi"] for r in tsi(df, ["user_id"], "d").collect()}
        q = [round(c * 1e6) for c in closes]
        em = am = em2 = am2 = 0
        want = {}
        for i in range(1, len(q)):
            m = q[i] - q[i - 1]
            a = abs(m)
            if i == 1:
                em, am, em2, am2 = m, a, m, a
            else:
                em += math.floor(2.0 * (m - em) / 26.0)
                am += math.floor(2.0 * (a - am) / 26.0)
                em2 += math.floor(2.0 * (em - em2) / 14.0)
                am2 += math.floor(2.0 * (am - am2) / 14.0)
            if am2:
                want[i] = 100.0 * em2 / am2
        assert out == want
        assert out[1] == 100.0  # seed bar: em2 == am2 (positive move)

    def test_tsi_flat_series_dropped(self, spark):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.finance import (
            tsi,
        )

        df = spark.createDataFrame(
            [(1, i, 5.0) for i in range(6)],
            "user_id long, d long, close double",
        )
        assert tsi(df, ["user_id"], "d").count() == 0  # |mtm| EMA stays 0

    def test_qstick_and_rvi_shapes(self, spark, sf_dir):
        import __spark_entry__ as E

        q = E.x_qstick(spark, sf_dir).limit(200).collect()
        assert q and all(r["n_obs"] <= 8 for r in q)
        first = q[0]
        assert first["n_obs"] == 1
        assert first["qstick"] == (
            round(first["close"] * 1e6) - round(first["open"] * 1e6)
        ) / 1e6

        r = E.x_rvi(spark, sf_dir).limit(200).collect()
        assert r and all(-1.0 <= row["rvi"] <= 1.0 for row in r)
        # signal defined only once 3 prior RVI rows exist
        assert r[0]["signal"] is None and r[1]["signal"] is None

    def test_rrf_fusion_math(self, spark):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.corpus import (
            reciprocal_rank_fusion,
        )

        a = spark.createDataFrame(
            [(10, 1), (20, 2), (30, 3)], "doc_id long, rank long"
        )
        b = spark.createDataFrame(
            [(20, 1), (10, 2), (40, 3)], "doc_id long, rank long"
        )
        out = {
            r["doc_id"]: r
            for r in reciprocal_rank_fusion([a, b], top=10).collect()
        }
        q = lambda r: math.floor(1e9 / (60.0 + r) + 0.5)
        assert out[10]["rrf_score"] == (q(1) + q(2)) / 1e9
        assert out[20]["rrf_score"] == (q(2) + q(1)) / 1e9
        assert out[10]["n_sources"] == 2 and out[30]["n_sources"] == 1
        # 10 and 20 tie exactly (symmetric ranks): doc_id breaks the tie
        assert out[10]["rank"] == 1 and out[20]["rank"] == 2

    def test_tsi_partition_invariance(self, spark):
        """The nested fold sorts inside each group, so the result must
        not depend on the input's physical partitioning."""
        import random

        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.finance import (
            tsi,
        )

        rng = random.Random(3)
        rows = [
            (u, d, 50.0 + rng.random() * 10)
            for u in range(5)
            for d in range(40)
        ]
        df = spark.createDataFrame(rows, "user_id long, d long, close double")
        a = {
            (r["user_id"], r["d"]): r["tsi"]
            for r in tsi(df.repartition(13), ["user_id"], "d").collect()
        }
        b = {
            (r["user_id"], r["d"]): r["tsi"]
            for r in tsi(df.coalesce(1), ["user_id"], "d").collect()
        }
        assert a == b and len(a) == 5 * 39


class TestZigZag:
    def test_hand_built_pivots(self, spark):
        """10 -> 11 (up >3%: LOW pivot at 10 once 11 hits) -> drops to
        10.5 (>3% off 11: HIGH pivot at 11) -> rises to 11.2 (>3% off
        10.5: LOW pivot at 10.5). Extremes, not confirming bars."""
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.finance import (
            zigzag_pivots,
        )

        closes = [10.0, 10.2, 11.0, 10.8, 10.5, 11.2]
        df = spark.createDataFrame(
            [(1, i, c) for i, c in enumerate(closes)],
            "user_id long, d long, close double",
        )
        out = [
            (r["pivot_date"], r["pivot_price"], r["pivot_type"])
            for r in zigzag_pivots(df, ["user_id"], "d", pct_bp=300)
            .orderBy("pivot_date")
            .collect()
        ]
        assert out == [(0, 10.0, "L"), (2, 11.0, "H"), (4, 10.5, "L")]

    def test_no_reversal_no_pivots(self, spark):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.finance import (
            zigzag_pivots,
        )

        df = spark.createDataFrame(
            [(1, i, 10.0 + i * 0.01) for i in range(10)],
            "user_id long, d long, close double",
        )
        # monotone drift under 3% total: direction never confirms
        assert zigzag_pivots(df, ["user_id"], "d", pct_bp=300).count() == 0


class TestAlligator:
    def test_hand_replay_and_displacement(self, spark):
        import math

        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.finance import (
            alligator,
        )

        rng_vals = [10.0, 10.4, 10.2, 10.8, 11.0, 10.6, 10.9, 11.2, 11.5, 11.1]
        df = spark.createDataFrame(
            [(1, i, c + 0.5, c - 0.5) for i, c in enumerate(rng_vals)],
            "user_id long, d long, high double, low double",
        )
        out = {r["d"]: r for r in alligator(df, ["user_id"], "d").collect()}
        # replay the three SMMA states on quantized midpoints
        m = [round((c + 0.5 + c - 0.5) * 5e5) for c in rng_vals]
        j = t = l = m[0]
        js, ts, ls = [j], [t], [l]
        for v in m[1:]:
            j += math.floor((v - j) / 13.0)
            t += math.floor((v - t) / 8.0)
            l += math.floor((v - l) / 5.0)
            js.append(j)
            ts.append(t)
            ls.append(l)
        for i in range(10):
            assert out[i]["mid"] == m[i] / 1e6
            assert out[i]["jaw"] == (js[i - 8] / 1e6 if i >= 8 else None)
            assert out[i]["teeth"] == (ts[i - 5] / 1e6 if i >= 5 else None)
            assert out[i]["lips"] == (ls[i - 3] / 1e6 if i >= 3 else None)


class TestVidya:
    def test_hand_replay(self, spark):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.finance import (
            vidya,
        )

        n, s = 3, 4
        closes = [10.0, 10.2, 10.1, 10.5, 10.4, 10.9, 11.0, 10.7]
        df = spark.createDataFrame(
            [(1, i, c) for i, c in enumerate(closes)],
            "user_id long, d long, close double",
        )
        out = {r["d"]: r for r in vidya(df, ["user_id"], "d", n=n, s=s).collect()}
        p = [round(c * 1e6) for c in closes]
        f6 = 2_000_000 // (s + 1)
        v = p[n - 1]
        exp_v = {n - 1: v}
        exp_cmo = {}
        for i in range(n, len(p)):
            d = [p[j + 1] - p[j] for j in range(i - n, i)]
            su = sum(x for x in d if x > 0)
            sd = sum(-x for x in d if x < 0)
            cmo6 = 0 if su + sd == 0 else (abs(su - sd) * 1_000_000) // (su + sd)
            a6 = (cmo6 * f6) // 1_000_000
            delta = p[i] - v
            if delta >= 0:
                v += (a6 * delta) // 1_000_000
            else:
                v -= (a6 * (-delta)) // 1_000_000
            exp_v[i] = v
            exp_cmo[i] = cmo6
        for i in range(len(p)):
            if i < n - 1:
                assert out[i]["vidya"] is None and out[i]["cmo"] is None
            elif i == n - 1:
                assert out[i]["vidya"] == exp_v[i] / 1e6
                assert out[i]["cmo"] is None
            else:
                assert out[i]["vidya"] == exp_v[i] / 1e6
                assert out[i]["cmo"] == exp_cmo[i] / 1e6

    def test_flat_series_tracks_nothing(self, spark):
        # flat window -> cmo 0 -> alpha 0 -> vidya frozen at the seed
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.finance import (
            vidya,
        )

        df = spark.createDataFrame(
            [(1, i, 5.0) for i in range(8)], "user_id long, d long, close double"
        )
        rows = vidya(df, ["user_id"], "d", n=3, s=4).collect()
        assert all(r["vidya"] == 5.0 for r in rows if r["vidya"] is not None)
        assert all(r["cmo"] == 0.0 for r in rows if r["cmo"] is not None)


class TestKlinger:
    def test_hand_replay(self, spark):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.finance import (
            klinger,
        )

        bars = [  # (high, low, close, volume)
            (10.5, 9.5, 10.0, 100),
            (10.8, 10.0, 10.6, 150),
            (10.7, 10.1, 10.2, 120),
            (11.0, 10.3, 10.9, 200),
            (11.2, 10.8, 11.0, 180),
            (11.1, 10.5, 10.6, 160),
        ]
        df = spark.createDataFrame(
            [(1, i, h, l, c, v) for i, (h, l, c, v) in enumerate(bars)],
            "user_id long, d long, high double, low double, close double,"
            " volume long",
        )
        out = {
            r["d"]: r
            for r in klinger(df, ["user_id"], "d", fast=3, slow=5, sig=2).collect()
        }
        h = [round(b[0] * 1e6) for b in bars]
        l = [round(b[1] * 1e6) for b in bars]
        c = [round(b[2] * 1e6) for b in bars]
        vol = [b[3] for b in bars]
        hlc = [h[i] + l[i] + c[i] for i in range(6)]
        dm = [h[i] - l[i] for i in range(6)]

        def ema(e, v, n):
            d = v - e
            return e + (2 * d) // (n + 1) if d >= 0 else e - (2 * (-d)) // (n + 1)

        cm = ef = es = eg = 0
        pt = 0
        for i in range(1, 6):
            t = 1 if hlc[i] > hlc[i - 1] else -1
            cm = (cm if t == pt else dm[i - 1]) + dm[i]
            vf6 = (
                t * vol[i] * abs((2 * dm[i] * 1_000_000) // cm - 1_000_000) * 100
                if cm > 0
                else 0
            )
            if i == 1:
                ef = es = vf6
                eg = 0
            else:
                ef = ema(ef, vf6, 3)
                es = ema(es, vf6, 5)
                eg = ema(eg, ef - es, 2)
            assert out[i]["kvo"] == (ef - es) / 1e6, i
            assert out[i]["signal"] == eg / 1e6, i
            pt = t
        assert out[0]["kvo"] is None and out[0]["signal"] is None


class TestUnimaxPlan:
    def test_water_fill_caps_and_level(self, spark):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.corpus import (
            unimax_plan,
        )

        # langs with 1 / 2 / 17 tokens; budget = 20 total, cap = 2 epochs
        docs = spark.createDataFrame(
            [
                (1, "a", "x"),
                (2, "b", "x y"),
                (3, "c", " ".join(["w"] * 17)),
            ],
            "doc_id long, lang string, text string",
        )
        out = {r["lang"]: r for r in unimax_plan(docs, "lang", "text").collect()}
        # caps: a=2, b=4, c=34. B=20. rank asc: a,b,c.
        # a capped? 20-2 >= 2*2 -> yes. b capped? 20-6 >= 4*1 -> yes.
        # c: level = (20-6)/1 = 14 < 34 -> c gets 14.
        assert out["a"]["alloc_tokens"] == 2.0 and out["a"]["epochs"] == 2.0
        assert out["b"]["alloc_tokens"] == 4.0 and out["b"]["epochs"] == 2.0
        assert out["c"]["alloc_tokens"] == 14.0
        assert abs(out["c"]["epochs"] - 14 / 17) < 1e-6
        # allocations exhaust the budget
        assert sum(r["alloc_tokens"] for r in out.values()) == 20.0

    def test_uniform_corpus_gets_one_epoch_each(self, spark):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.corpus import (
            unimax_plan,
        )

        docs = spark.createDataFrame(
            [(i, f"l{i % 4}", "a b c d e") for i in range(40)],
            "doc_id long, lang string, text string",
        )
        rows = unimax_plan(docs, "lang", "text").collect()
        assert all(r["epochs"] == 1.0 for r in rows)
        assert all(r["alloc_tokens"] == r["n_tokens"] for r in rows)


class TestGarchVol:
    def test_hand_replay(self, spark):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.finance import (
            garch_vol,
        )

        closes = [10.0, 10.2, 9.9, 10.5, 10.4, 11.0]
        omega12, alpha6, beta6 = 5_000_000, 100_000, 850_000
        df = spark.createDataFrame(
            [(1, i, c) for i, c in enumerate(closes)],
            "user_id long, d long, close double",
        )
        out = {
            r["d"]: r for r in garch_vol(df, ["user_id"], "d").collect()
        }
        p = [round(c * 1e6) for c in closes]
        v = 0
        r_prev = 0
        for i in range(1, len(p)):
            pp, pc = p[i - 1], p[i]
            if pc >= pp:
                r6 = ((pc - pp) * 1_000_000) // pp
            else:
                r6 = -(((pp - pc) * 1_000_000) // pp)
            r6 = max(-10_000_000, min(10_000_000, r6))
            if i == 1:
                v = r6 * r6
            else:
                v = (
                    omega12
                    + alpha6 * ((r_prev * r_prev) // 1_000_000)
                    + beta6 * (v // 1_000_000)
                )
            assert out[i]["ret"] == r6 / 1e6
            assert out[i]["cond_var"] == v / 1e12
            assert out[i]["sigma"] == math.floor(math.sqrt(v) + 0.5) / 1e6
            r_prev = r6
        assert out[0]["ret"] is None and out[0]["cond_var"] is None

    def test_flat_series_decays_to_omega_floor(self, spark):
        # zero returns: v_t = omega + beta * v_{t-1} with v_2 = 0 ->
        # v stays at the pure-omega accumulation, sigma tiny but > 0
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.finance import (
            garch_vol,
        )

        df = spark.createDataFrame(
            [(1, i, 5.0) for i in range(6)],
            "user_id long, d long, close double",
        )
        rows = {r["d"]: r for r in garch_vol(df, ["user_id"], "d").collect()}
        assert rows[1]["cond_var"] == 0.0
        v = 0
        for i in range(2, 6):
            v = 5_000_000 + 850_000 * (v // 1_000_000)
            assert rows[i]["cond_var"] == v / 1e12
        assert all(r["ret"] == 0.0 for d, r in rows.items() if d >= 1)

    def test_return_cap_bounds_state(self, spark):
        # a 100x gap caps at +-1000% so the integer state cannot overflow
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.finance import (
            garch_vol,
        )

        df = spark.createDataFrame(
            [(1, 0, 1.0), (1, 1, 100.0), (1, 2, 0.5)],
            "user_id long, d long, close double",
        )
        rows = {r["d"]: r for r in garch_vol(df, ["user_id"], "d").collect()}
        assert rows[1]["ret"] == 10.0  # capped, raw would be 99.0
        assert rows[1]["cond_var"] == 100.0  # (1e7)^2 / 1e12
        assert rows[2]["ret"] == -0.995


class TestHoltLinear:
    def test_hand_replay_with_falling_series(self, spark):
        # a falling tail drives the trend state NEGATIVE — the case the
        # sign-branched division exists for
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.finance import (
            holt_linear,
        )

        closes = [10.0, 10.4, 10.2, 9.8, 9.1, 8.5]
        a6, g6 = 300_000, 100_000
        ca6, cg6 = 1_000_000 - a6, 1_000_000 - g6

        def sdiv(num):
            return num // 1_000_000 if num >= 0 else -((-num) // 1_000_000)

        df = spark.createDataFrame(
            [(1, i, c) for i, c in enumerate(closes)],
            "user_id long, d long, close double",
        )
        out = {r["d"]: r for r in holt_linear(df, ["user_id"], "d").collect()}
        p = [round(c * 1e6) for c in closes]
        l, b = p[0], 0
        assert out[0]["level"] == l / 1e6 and out[0]["trend"] == 0.0
        for i in range(1, len(p)):
            l_prev = l
            l = sdiv(a6 * p[i] + ca6 * (l + b))
            b = sdiv(g6 * (l - l_prev) + cg6 * b)
            assert out[i]["level"] == l / 1e6
            assert out[i]["trend"] == b / 1e6
            assert out[i]["forecast"] == (l + b) / 1e6
        assert b < 0  # the series fell: trend must be negative

    def test_flat_series_is_fixed_point(self, spark):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.finance import (
            holt_linear,
        )

        df = spark.createDataFrame(
            [(1, i, 7.0) for i in range(6)],
            "user_id long, d long, close double",
        )
        rows = holt_linear(df, ["user_id"], "d").collect()
        assert all(r["level"] == 7.0 for r in rows)
        assert all(r["trend"] == 0.0 for r in rows)
        assert all(r["forecast"] == 7.0 for r in rows)


class TestCusumDrift:
    def test_closed_form_matches_naive_recurrence(self, spark):
        """The window closed form c_t - min(0, prefix-min(c)) must equal
        the textbook clamped recurrence s_t = max(0, s_{t-1} + d_t) —
        replayed here in plain Python on the quantized increments."""
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.windows import (
            cusum_drift,
        )

        # 30 stable bars then a sustained +1.0 level shift: enough
        # post-shift mass for the positive CUSUM to cross h = 4 sigma
        # (a short shift inflates sigma faster than it accumulates
        # drift and never alarms — by design)
        vals = [10.0 + 0.05 * ((i % 3) - 1) for i in range(30)] + [
            11.0 + 0.05 * ((i % 3) - 1) for i in range(10)
        ]
        df = spark.createDataFrame(
            [(1, i, v) for i, v in enumerate(vals)],
            "user_id long, d long, px double",
        )
        out = {r["d"]: r for r in cusum_drift(df, ["user_id"], "d", "px").collect()}
        # replicate mu/sigma exactly as the operator computes them
        import math

        n = float(len(vals))
        sx, sxx = sum(vals), sum(v * v for v in vals)
        var = (n * sxx - sx * sx) / (n * (n - 1.0))
        mu6 = math.floor(sx / n * 1e6 + 0.5)
        sig6 = math.floor(math.sqrt(var) * 1e6 + 0.5)
        k6 = sig6 // 2
        h6 = sig6 * 4
        sp = sn = 0
        for i, v in enumerate(vals):
            v6 = math.floor(v * 1e6 + 0.5)
            sp = max(0, sp + (v6 - mu6 - k6))
            sn = max(0, sn + (mu6 - v6 - k6))
            assert out[i]["cusum_pos"] == sp / 1e6
            assert out[i]["cusum_neg"] == sn / 1e6
            assert out[i]["alarm_pos"] == (sig6 > 0 and sp > h6)
            assert out[i]["alarm_neg"] == (sig6 > 0 and sn > h6)
        # the level shift at t=4 must have tripped the positive side
        assert any(out[i]["alarm_pos"] for i in range(len(vals)))

    def test_constant_series_never_alarms(self, spark):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.windows import (
            cusum_drift,
        )

        df = spark.createDataFrame(
            [(1, i, 5.0) for i in range(8)],
            "user_id long, d long, px double",
        )
        rows = cusum_drift(df, ["user_id"], "d", "px").collect()
        assert all(not r["alarm_pos"] and not r["alarm_neg"] for r in rows)
        assert all(r["cusum_pos"] == 0.0 and r["cusum_neg"] == 0.0 for r in rows)
