"""Unit tests for the third indicator batch (operators/finance.py):
Parabolic SAR, TRIX, CCI, Vortex — plus the DSIR importance-weight
operator (operators/corpus.py). Each pins hand-checked math on a tiny
series plus the edge conventions the SQL oracles replay (warm-up NULLs,
flat-window NULLs, reversal/acceleration mechanics)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.corpus import (
    dsir_weights,
)
from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.finance import (
    cci,
    parabolic_sar,
    trix,
    vortex,
)


def _bars(spark, rows):
    """rows: (sym, t, high, low, close)"""
    return spark.createDataFrame(
        [
            Row(sym=s, t=t, high=float(h), low=float(lo), close=float(c))
            for (s, t, h, lo, c) in rows
        ]
    )


class TestParabolicSar:
    def test_seed_and_uptrend_mechanics(self, spark):
        # steady uptrend: seeds long at min(low1,low2), EP tracks highs,
        # AF steps 0.02 per new extreme, SAR never enters the prior two
        # bars' range
        rows = [("A", i, 100 + i, 98 + i, 99.5 + i) for i in range(1, 8)]
        df = _bars(spark, rows)
        out = {r.t: r for r in parabolic_sar(df, ["sym"], "t").collect()}
        assert out[1].psar is None and out[1].trend is None
        # seed: close2 > close1 -> long; sar = min(low1, low2) = 99,
        # ep = max(high1, high2) = 102, af = 2
        assert out[2].trend == 1
        assert out[2].psar == pytest.approx(99.0)
        assert out[2].ep == pytest.approx(102.0)
        assert out[2].af == 2
        # every later bar: still long, EP = running max high, AF stepped
        # by 2 per bar (new high every bar) up to 20
        for t in range(3, 8):
            assert out[t].trend == 1
            assert out[t].ep == pytest.approx(100.0 + t)
            assert out[t].af == min(2 * (t - 1), 20)
            # SAR below the prior two lows (clamp) and monotone rising
            assert out[t].psar <= min(96 + t, 97 + t) + 1e-9
            assert out[t].psar >= out[t - 1].psar - 1e-9

    def test_reversal_resets_state(self, spark):
        # uptrend then a crash bar far below SAR: flips short, SAR
        # becomes the prior EP, EP the crash low, AF resets
        rows = [("A", i, 100 + i, 98 + i, 99.5 + i) for i in range(1, 6)]
        rows.append(("A", 6, 95.0, 80.0, 81.0))
        df = _bars(spark, rows)
        out = {r.t: r for r in parabolic_sar(df, ["sym"], "t").collect()}
        prev_ep = out[5].ep
        assert out[6].trend == -1
        assert out[6].psar == pytest.approx(prev_ep)
        assert out[6].ep == pytest.approx(80.0)
        assert out[6].af == 2

    def test_single_bar_group_all_null(self, spark):
        df = _bars(spark, [("A", 1, 10, 9, 9.5)])
        [r] = parabolic_sar(df, ["sym"], "t").collect()
        assert r.psar is None and r.trend is None


class TestTrix:
    def test_constant_series_zero_trix(self, spark):
        df = _bars(spark, [("A", t, 50, 50, 50.0) for t in range(1, 10)])
        out = {r.t: r for r in trix(df, ["sym"], "t", n=15).collect()}
        assert out[1].trix is None  # no prior e3
        for t in range(2, 10):
            assert out[t].trix == 0.0
            assert out[t].trix_ema == pytest.approx(50.0)

    def test_uptrend_positive_and_exact_first_step(self, spark):
        # closes 10, 26: e1 = 10_000000 + floor(2*(26-10)*1e6/16) =
        # 12_000000; e2 = 10_000000 + floor(2*2e6/16) = 10_250000;
        # e3 = 10_000000 + floor(2*0.25e6/16) = 10_031250
        df = _bars(spark, [("A", 1, 10, 10, 10.0), ("A", 2, 26, 26, 26.0)])
        out = {r.t: r for r in trix(df, ["sym"], "t", n=15).collect()}
        assert out[2].trix_ema == pytest.approx(10.03125)
        assert out[2].trix == pytest.approx(100.0 * 31250 / 10_000_000)


class TestCci:
    def test_window_shorter_than_n_is_null(self, spark):
        df = _bars(spark, [("A", t, 10, 8, 9.0) for t in range(1, 5)])
        for r in cci(df, ["sym"], ["t"], n=20).collect():
            assert r.cci is None

    def test_flat_window_is_null(self, spark):
        df = _bars(spark, [("A", t, 10, 10, 10.0) for t in range(1, 6)])
        for r in cci(df, ["sym"], ["t"], n=3).collect():
            assert r.cci is None  # mad = 0

    def test_hand_checked_value(self, spark):
        # typical prices 1, 2, 6 with n=3: sma = 3, mad = (2+1+3)/3 = 2,
        # cci = (6-3)/(0.015*2) = 100
        df = _bars(
            spark,
            [("A", 1, 1, 1, 1.0), ("A", 2, 2, 2, 2.0), ("A", 3, 6, 6, 6.0)],
        )
        out = {r.t: r for r in cci(df, ["sym"], ["t"], n=3).collect()}
        assert out[1].cci is None and out[2].cci is None
        assert out[3].cci == pytest.approx(100.0)


class TestVortex:
    def test_warmup_and_hand_checked(self, spark):
        # bars: (h,l,c) = (12,10,11), (13,11,12), (14,12,13)
        # vm+ = |13-10|=3, |14-11|=3 ; vm- = |11-12|=1, |12-13|=1
        # tr(2) = max(2, |13-11|, |11-11|) = 2, tr(3) = 2
        # n=2 at t=3: vi+ = 6/4 = 1.5, vi- = 2/4 = 0.5
        df = _bars(
            spark,
            [("A", 1, 12, 10, 11.0), ("A", 2, 13, 11, 12.0), ("A", 3, 14, 12, 13.0)],
        )
        out = {r.t: r for r in vortex(df, ["sym"], ["t"], n=2).collect()}
        assert out[1].vi_plus is None
        assert out[2].vi_plus is None  # only one lagged movement so far
        assert out[3].vi_plus == pytest.approx(1.5)
        assert out[3].vi_minus == pytest.approx(0.5)


class TestDsirWeights:
    def _docs(self, spark):
        return spark.createDataFrame(
            [
                Row(doc_id=1, text="the cat sat", lang="en"),
                Row(doc_id=2, text="the cat sat on the mat", lang="en"),
                Row(doc_id=3, text="der hund lief", lang="de"),
                Row(doc_id=4, text="the cat sat", lang="de"),
                Row(doc_id=5, text="one", lang="en"),  # < 2 tokens: dropped
            ]
        )

    def test_target_like_docs_score_higher(self, spark):
        out = {
            r.doc_id: r
            for r in dsir_weights(
                self._docs(spark), F.col("lang") == "en"
            ).collect()
        }
        assert 5 not in out  # no bigram, no evidence
        # doc 4 shares every bigram with the target slice -> its weight
        # equals doc 1's (same bag), and both beat the German doc 3
        assert out[4].logw == pytest.approx(out[1].logw)
        # sign is NOT asserted: with add-one smoothing the raw model
        # includes the target slice, so on a tiny corpus even English
        # bigrams score slightly below zero — only the ORDER is the
        # contract (target-like above out-of-slice)
        assert out[3].avg_logw < out[1].avg_logw

    def test_weight_math_one_bucket_feature(self, spark):
        # smoothing sanity: every per-bucket log-ratio is
        # ln((ct+1)/(Nt+B)) - ln((cr+1)/(Nr+B)) quantized to 1e-6; check
        # one doc's sum against a python replay
        docs = self._docs(spark)
        out = {r.doc_id: r for r in dsir_weights(docs, F.col("lang") == "en").collect()}
        # python replay with the same md5-bucket hashing
        import hashlib
        from collections import Counter

        def th(t):
            return int(hashlib.md5(t.encode()).hexdigest()[:12], 16)

        def grams(text):
            toks = text.lower().split()
            return list(zip(toks, toks[1:]))

        def bucket(g):
            a, b = g
            return (th(a) * 31 + th(b)) % 4096

        rows = [(1, "the cat sat", True), (2, "the cat sat on the mat", True),
                (3, "der hund lief", False), (4, "the cat sat", True)]
        # NOTE: doc 4 is lang=de -> is_target False in the operator; the
        # replay uses the same flag
        rows[3] = (4, "the cat sat", False)
        tgt, raw = Counter(), Counter()
        for _, text, is_t in rows:
            for g in grams(text):
                b = bucket(g)
                raw[b] += 1
                if is_t:
                    tgt[b] += 1
        nt, nr = sum(tgt.values()), sum(raw.values())
        B = 4096

        def lw(b):
            v = math.log((tgt[b] + 1) / (nt + B)) - math.log((raw[b] + 1) / (nr + B))
            return math.floor(v * 1e6 + 0.5) / 1e6

        expect = sum(lw(bucket(g)) for g in grams("the cat sat"))
        assert out[1].logw == pytest.approx(expect, abs=1e-6)


class TestKama:
    def test_flat_series_stays_at_price(self, spark):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.finance import (
            kama,
        )

        df = _bars(spark, [("A", t, 50, 50, 50.0) for t in range(1, 15)])
        out = {r.t: r for r in kama(df, ["sym"], "t", n=10).collect()}
        for t in range(1, 10):
            assert out[t].kama is None  # warm-up
        assert out[10].kama == pytest.approx(50.0)  # seed bar
        for t in range(11, 15):
            assert out[t].er == 0.0  # flat window convention
            assert out[t].kama == pytest.approx(50.0)

    def test_trending_series_er_one_and_fast_tracking(self, spark):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.finance import (
            kama,
        )

        # perfectly monotone: |p_t - p_{t-10}| == sum of |steps| -> er = 1,
        # sc = (2/3)^2 quantized; hand-fold the first update
        df = _bars(spark, [("A", t, 0, 0, float(t)) for t in range(1, 13)])
        out = {r.t: r for r in kama(df, ["sym"], "t", n=10).collect()}
        assert out[11].er == pytest.approx(1.0)
        cf6, cs6 = 2_000_000 // 3, 2_000_000 // 31
        sc6 = (1_000_000 * (cf6 - cs6)) // 1_000_000 + cs6
        sc2 = (sc6 * sc6) // 1_000_000
        e = 10_000_000 + (sc2 * (11_000_000 - 10_000_000)) // 1_000_000
        assert out[11].kama == pytest.approx(e / 1e6)
        # still adapting upward, bounded by the price
        assert out[11].kama < 11.0
        assert out[12].kama > out[11].kama
