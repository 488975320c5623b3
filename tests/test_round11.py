"""Round-11 additions: quantizer-drift recall report, streaming
freshness row, regime-conditional smoother (16th fold family)."""

from __future__ import annotations

import pytest

import __spark_entry__ as E


def test_emb_drift_recall_shifted_distribution(spark, sf_dir):
    """The drift report (round-10 VERDICT item 3): two scenarios, exact
    deterministic counts (seeded fit), and the simulated distribution
    shift (+0.25 per coordinate) LOWERS the cell-pruned screen's recall
    on this dataset — the rebuild-cadence signal the report exists
    for."""
    rows = {
        r["scenario"]: r
        for r in E.s_emb_drift_recall(spark, sf_dir).collect()
    }
    assert set(rows) == {"baseline", "shifted"}
    for r in rows.values():
        assert 0 <= r["n_caught_pairs"] <= r["n_true_pairs"]
        assert 0.0 <= r["pair_recall"] <= 1.0
    # deterministic seeded k-means + quantized cosine: pin the sf0.001
    # ground truth exactly
    assert rows["baseline"]["n_true_pairs"] == 40
    assert rows["baseline"]["n_caught_pairs"] == 17
    assert rows["shifted"]["n_true_pairs"] == 48
    assert rows["shifted"]["n_caught_pairs"] == 17
    assert rows["shifted"]["pair_recall"] < rows["baseline"]["pair_recall"]


def test_stream_freshness_pipeline(spark, sf_dir):
    """End-to-end freshness (round-10 VERDICT item 4): the streamed
    ingest→silver-upsert→rollup refresh must be lossless (rollup equals
    the direct batch computation) and the measurement half must report
    a positive wall + rows/sec consistent with the rollup."""
    from pyspark.sql import functions as F

    rollup, stats = E._run_freshness_pipeline(spark, sf_dir)
    got = {
        (r["symbol_clean"], str(r["trade_date"])): (
            r["first_value"], r["last_value"], r["max_value"],
            r["min_value"], r["num_candles"],
        )
        for r in rollup.collect()
    }
    # direct batch twin: per-(symbol, second) collapse then daily OHLC
    ev = E._t(spark, sf_dir, "events").filter(F.col("value") > 0)
    pc = ev.groupBy(
        (F.col("user_id") % 5).alias("sid"),
        F.unix_timestamp("ts").cast("long").alias("sec"),
    ).agg(
        F.min("value").alias("v"),
        F.min("event_id").alias("eid"),
        F.min(F.to_date("ts")).alias("d"),
    )
    want = {
        (f"U{r['sid']}", str(r["d"])): (
            r["fv"], r["lv"], r["mx"], r["mn"], r["n"]
        )
        for r in pc.groupBy("sid", "d")
        .agg(
            F.min_by("v", F.struct("sec", "eid")).alias("fv"),
            F.max_by("v", F.struct("sec", "eid")).alias("lv"),
            F.max("v").alias("mx"),
            F.min("v").alias("mn"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert got == want and got
    assert stats["n_raw_files"] > 0
    assert stats["e2e_wall_sec"] > 0
    assert stats["rows_per_sec"] > 0
    assert stats["n_silver_rows"] == sum(v[4] for v in want.values())


def test_bnlj_allowlist_audit_logic():
    """The machine-readable BNLJ allowlist (round-10 VERDICT item 6):
    unlisted BNLJ -> violation, stale entry -> violation, allowlisted
    entry with sites -> clean."""
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    import importlib

    er = importlib.import_module("explain_report")
    assert er._audit({"e_period_lookback": 2}, strict_missing=False) == []
    errs = er._audit({"brand_new_query": 2}, strict_missing=False)
    assert any("UNLISTED" in e for e in errs)
    errs = er._audit({"e_period_lookback": 0}, strict_missing=False)
    assert any("STALE" in e for e in errs)
    # strict mode flags allowlist entries with no plan at all
    errs = er._audit({"e_period_lookback": 2}, strict_missing=True)
    assert any("MISSING PLAN" in e for e in errs)
