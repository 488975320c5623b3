"""Round-9 queries: semantic invariants the oracle hash cannot see
(the hash proves Spark == DuckDB; these prove both mean what the
docstrings claim)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

import __spark_entry__ as E


def test_fractals_are_strict_local_extremes(spark, sf_dir):
    rows = E.x_fractals(spark, sf_dir).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    n_high = 0
    for series in by_user.values():
        for i, r in enumerate(series):
            if r["fractal_high"]:
                n_high += 1
                assert 2 <= i < len(series) - 2  # edges can never flag
                window = series[i - 2 : i + 3]
                assert all(
                    r["high"] > o["high"] for o in window if o is not r
                )
    assert n_high > 0, "fixture series has no 5-bar pivots"


def test_rvol_constant_volume_is_one(spark):
    rows = [(1, f"2024-01-{d:02d}", 100) for d in range(1, 25)]
    df = spark.createDataFrame(rows, "user_id long, trade_date string, volume long")
    # drive the same expression shape the query uses
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("trade_date")
    prior = w.rowsBetween(-20, -1)
    rvol = (
        (F.col("volume") * F.count(F.lit(1)).over(prior).cast("long"))
        .cast("double")
        / F.sum("volume").over(prior).cast("long").cast("double")
    )
    got = df.select(rvol.alias("rvol")).collect()
    assert got[0]["rvol"] is None  # no history
    assert all(r["rvol"] == 1.0 for r in got[1:])


def test_squeeze_flag_matches_band_containment(spark, sf_dir):
    rows = E.x_squeeze(spark, sf_dir).collect()
    assert rows
    for r in rows:
        want = r["bb_upper"] < r["kc_upper"] and r["bb_lower"] > r["kc_lower"]
        assert r["squeeze_on"] == want
        assert r["bb_upper"] >= r["bb_lower"]


def test_mad_median_is_an_element_and_flags_are_robust(spark, sf_dir):
    rows = E.e_mad_anomaly(spark, sf_dir).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for series in by_user.values():
        q = [round(r["px"] * 1e6) for r in series]
        med6 = round(series[0]["med"] * 1e6)
        assert med6 in q  # DISCRETE median: an actual element
        devs = sorted(abs(v - med6) for v in q)
        mad6 = round(series[0]["mad"] * 1e6)
        assert mad6 == devs[(len(devs) + 1) // 2 - 1]  # lower median
        for r in series:
            dev6 = abs(round(r["px"] * 1e6) - med6)
            assert r["is_anomaly"] == (dev6 * 10000 > 3 * 14826 * mad6)


def test_asof_forward_picks_earliest_purchase_within_tolerance(spark, sf_dir):
    import datetime

    out = E.j_asof_forward(spark, sf_dir).collect()
    ev = E._t(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    ).collect()
    buys: dict = {}
    for r in ev:
        if r["event_type"] == "purchase":
            buys.setdefault(r["user_id"], []).append(r)
    checked = nulls = 0
    for r in out:
        cands = [
            b
            for b in buys.get(r["user_id"], [])
            if r["ts"] <= b["ts"] <= r["ts"] + datetime.timedelta(days=7)
        ]
        if not cands:
            assert r["next_purchase_id"] is None
            nulls += 1
        else:
            best = min(cands, key=lambda b: (b["ts"], b["event_id"]))
            assert r["next_purchase_id"] == float(best["event_id"])
            checked += 1
    assert checked > 0 and nulls > 0  # both outcomes exercised


def test_removal_plan_mass_balance_vs_cluster_stats(spark, sf_dir):
    """The two consumers of the persisted decision set must agree on
    the total removable mass — the cross-report consistency a corpus
    owner implicitly assumes."""
    plan = E.d_dedup_removal_plan(spark, sf_dir).collect()
    stats = E.d_dup_cluster_stats(spark, sf_dir).collect()
    assert sum(r["n_remove"] for r in plan) == sum(
        r["n_removable"] for r in stats
    )
    assert sum(r["n_clustered"] for r in plan) == sum(
        r["n_docs"] for r in stats
    )
    n_docs_total = E._t(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in plan) == n_docs_total
    for r in plan:
        assert 0 <= r["n_remove"] <= r["n_clustered"] <= r["n_docs"]
        assert math.isclose(r["removal_rate"], r["n_remove"] / r["n_docs"])


def test_t3_hand_replay_and_constant_series(spark):
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.finance import (
        t3_ma,
    )

    vals = [10.0, 12.0, 11.0, 15.0, 14.0, 13.5, 16.0, 15.5]
    rows = [(1, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "user_id long, rn long, close double")
    got = [
        r["t3"]
        for r in t3_ma(df, ["user_id"], "rn", n=10).orderBy("rn").collect()
    ]
    # hand replay of the documented integer recipe
    e = [0] * 6
    want = []
    for i, v in enumerate(vals):
        vi = math.floor(v * 1e6 + 0.5)
        if i == 0:
            e = [vi] * 6
        else:
            prev = vi
            for k in range(6):
                e[k] += math.floor(2.0 * (prev - e[k]) / 11.0)
                prev = e[k]
        want.append((-343 * e[5] + 2499 * e[4] - 6069 * e[3] + 4913 * e[2]) / 1e9)
    assert got == want
    # constant series: every EMA state pins to the input, coefficients
    # sum to exactly 1 -> t3 == the constant
    const = [(2, i, 42.0) for i in range(6)]
    cdf = spark.createDataFrame(const, "user_id long, rn long, close double")
    out = t3_ma(cdf, ["user_id"], "rn").collect()
    assert all(r["t3"] == 42.0 for r in out)


def test_stream_bloom_no_false_negatives_and_mass_balance(spark, sf_dir):
    out = E.s_stream_bloom(spark, sf_dir).collect()
    ev = E._t(spark, sf_dir, "events").select("user_id", "ts").collect()
    assert sum(r["n_events"] for r in out) == len(ev)
    # no false negatives: every event from a member (even) user must be
    # counted as known — so per day, unknown count <= odd-user events
    from collections import Counter

    odd_by_day = Counter(
        r["ts"].date() for r in ev if r["user_id"] % 2 == 1
    )
    for r in out:
        if not r["known_user"]:
            assert r["n_events"] <= odd_by_day[r["bucket_start"].date()]


def test_mcginley_hand_replay_and_adaptivity(spark):
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.finance import (
        mcginley_dynamic,
    )

    vals = [10.0, 10.5, 60.0, 9.0, 11.0, 11.2, 2.0, 10.0]
    rows = [(1, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "user_id long, rn long, close double")
    got = [
        r["mcginley"]
        for r in mcginley_dynamic(df, ["user_id"], "rn", n=10)
        .orderBy("rn")
        .collect()
    ]
    md = 0.0
    want = []
    for i, p in enumerate(vals):
        if i == 0 or md <= 0.0:
            md = p
        else:
            q = p / md
            q = 4.0 if q > 4.0 else (0.25 if q < 0.25 else q)
            q2 = q * q
            d = 6.0 * (q2 * q2)
            md = md + (p - md) / (d if d > 1.0 else 1.0)
        want.append(md)
    assert got == want  # bit-identical to the documented recurrence
    # the divisor floor means a step reaches price but never overshoots:
    # the state stays inside the running [min, max] input envelope, so
    # positive inputs keep a positive state even through the 5x crash
    for i, g in enumerate(got):
        assert min(vals[: i + 1]) - 1e-9 <= g <= max(vals[: i + 1]) + 1e-9
    assert all(x > 0 for x in got)
