"""sf1 sweep for the recurrence/iterative operator family.

The grouped-map folds (supertrend, heikin-ashi, EMA) and the iterative
operators (BPE learn, dup-graph components) are the only places where
DATA GROWTH changes the execution shape: per-key history LENGTH drives
the pandas fold and the recursive oracle depth, and pair-graph density
drives the convergence round count. This script builds a local sf1
(10x sf0.1) by extending the TIME AXIS of events (same 1500 users, 10x
rows per user -> 10x longer folds) and replicating documents 10x
(exact-dup clusters of 10 -> denser pair graph, larger components).

Two passes:

1. ORACLE PARITY on a key-subset dir (.tmp_sf1_sub): the FULL 10x fold
   length / replica density, but 100 of 1500 users and 1000 of 5000
   base docs — the execution shape under growth is per-key, so this is
   the divergence check; the full-population DuckDB recursive CTEs
   (1M rows x ~670 recursion depth) would grind for tens of minutes
   without testing anything additional.
2. SPARK WALLS on the full sf1 dir (.tmp_sf1): noop-sink end-to-end
   timings of all five queries at the full 10x population.

Usage: python scripts/sf1_sweep.py   (prints a table for NOTES.md,
exits non-zero on any divergence)
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"
DST = os.path.join(REPO, ".tmp_sf1")
SUB = os.path.join(REPO, ".tmp_sf1_sub")

QUERIES = [
    "x_supertrend",
    "x_heikin_ashi",
    "x_ema_macd",
    "d_bpe_learn",
    "d_dup_components",
    # round 6 (VERDICT r5 ask #8): the shuffle-heavy join/ANN family —
    # candidate-set blowup under 10x replica density is what sf0.1
    # cannot show (LSH buckets get 10 identical signatures per base
    # doc; interval joins get 10x rows per user; ANN corpora grow 10x)
    "d_minhash_neardup",
    "j_interval_clicks",
    "emb_pq_ann",
    "emb_semdedup",
    # round 7 (VERDICT r6 ask #6): the round-6 recurrence/indicator
    # families (10x fold length per user) plus the distributed-rank
    # scalar pair (10x per-user totals feeding the two-pass rank) and
    # the new line-frequency filter (10x replica density inflates every
    # line's doc-frequency past the threshold — worst-case drop rate)
    "x_renko",
    "x_chandelier",
    "x_chop",
    "x_cmf",
    "x_vwma",
    "e_gini",
    "e_pareto_share",
    "d_line_dedup",
    # round 8 (VERDICT r7 ask #6): the r7 newcomers that had no sf1 row
    # yet (signal-fusion ranks, fertility scalars, the recall report's
    # double top-k, the mixture planner, the first-seen cohort split)
    # plus the new probe-only ANN lifecycle rows (stored-index probe
    # latency under a 10x corpus)
    "d_quality_fusion",
    "d_bpe_fertility",
    "emb_recall_report",
    "d_mixture_plan",
    "e_new_vs_returning",
    "emb_ivf_probe",
    "emb_pq_probe",
    # round 8 newcomers: the GARCH fold (10x per-user recursion depth),
    # the two pipeline reports (10x corpus through packing /
    # contamination), the UniMax planner, and the dedup recall report —
    # whose ground-truth side is the guarded O(n^2) twin over the 10%
    # sample (5k docs at sf1 -> 12.5M exact pairs: the wall shows what
    # the sample bound buys)
    "x_garch_vol",
    "x_vidya",
    "x_klinger",
    "d_unimax_plan",
    "d_packing_efficiency",
    "d_contamination_report",
    "d_minhash_recall",
    # late round 8: the ANN/dedup recall twins, the Holt fold, the
    # cluster-size report, and the CUSUM pair (closed-form batch windows
    # + batch-calibrated streaming monitor)
    "emb_ivf_recall",
    "x_holt_linear",
    "d_dup_cluster_stats",
    # round 9: the persisted dedup-components lifecycle — the probe row
    # reads the stored decision parquet (the chain cost amortizes the
    # way the ANN fit does); cluster stats above now also reads it
    "d_dup_components_probe",
    # round 9 newcomers: window indicators (fractals/rvol/squeeze), the
    # robust MAD screen (3 keyed sorts per user at 10x depth), the
    # forward as-of funnel join (10x rows per user through the union
    # fill), the six-state T3 fold, the removal plan (decision join at
    # 10x corpus), and the streaming bloom probe (5 broadcast joins on
    # a 10x stream)
    "x_fractals",
    "x_rvol",
    "x_squeeze",
    "e_mad_anomaly",
    "j_asof_forward",
    "d_dedup_removal_plan",
    "x_t3",
    "s_stream_bloom",
    "x_mcginley",
    "x_vwap_bands",
    "x_elder_impulse",
    "e_burst_detection",
    "d_threshold_curve",
    "m_frame_sample",
    "j_nearest_event",
    "d_source_overlap",
    "o_bucketed_join",
    "x_holt_winters",
    "x_holt_winters_mul",
    "x_amihud_illiquidity",
    "x_rsi_divergence",
    "x_vol_cone",
    "d_length_quantiles",
    "o_zorder_skipping",
    "s_stream_emb_dedup",
    "x_regime_viterbi",
    "e_hdr_quantiles",
    "x_forecast_backtest",
    "e_cusum_drift",
    "s_stream_cusum",
    "d_bloom_membership",
    "e_benford_digits",
    "d_vocab_coverage",
]

# emb_semdedup at 20k vectors with the registry's n_lists=8 leaves
# ~2.5k vectors per k-means cell — below the 4096 default guard but
# already ~25M within-cell pair evaluations. The sweep times BOTH the
# registry shape and a guard-engaged variant (max_cell_size=1024) to
# show the split bounding the quadratic stage at sf1.
def _semdedup_guarded(spark, sf_dir):
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.similarity import (
        semdedup,
    )
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.sources.tables import (
        load_table,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return semdedup(emb, threshold=0.4, n_lists=8, n_iter=2, max_cell_size=1024)


EXTRA_WALLS = {"emb_semdedup_guard1024": _semdedup_guarded}

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def build() -> None:
    con = duckdb.connect()
    for dst, user_bound, doc_bound in ((DST, 10**9, 10**9), (SUB, 100, 1000)):
        os.makedirs(dst, exist_ok=True)
        # events: 10 time-shifted replicas -> same users, 10x history each
        con.sql(
            f"""
            COPY (
              SELECT event_id + i * 100000 AS event_id,
                     ts + to_days(30 * i::INT) AS ts,
                     user_id, event_type, value, props
              FROM '{SRC}/events.parquet', generate_series(0, 9) t(i)
              WHERE user_id < {user_bound}
              ORDER BY event_id
            ) TO '{dst}/events.parquet' (FORMAT PARQUET)
            """
        )
        # documents: 10 id-shifted replicas -> exact-dup clusters of 10
        con.sql(
            f"""
            COPY (
              SELECT doc_id + i * 5000 AS doc_id, text, lang, source, n_chars
              FROM '{SRC}/documents.parquet', generate_series(0, 9) t(i)
              WHERE doc_id < {doc_bound}
              ORDER BY doc_id
            ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
            """
        )
        # embeddings: 10 id-shifted exact replicas -> 10x ANN corpus,
        # dup clusters of 10 for semdedup (vec_bound mirrors doc_bound's
        # subset role: 200 base vecs -> 2000 for the oracle-parity dir)
        vec_bound = 10**9 if doc_bound == 10**9 else 200
        con.sql(
            f"""
            COPY (
              SELECT vec_id + i * 2000 AS vec_id, embedding, label
              FROM '{SRC}/embeddings.parquet', generate_series(0, 9) t(i)
              WHERE vec_id < {vec_bound}
              ORDER BY vec_id
            ) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)
            """
        )
        for t in TABLES:
            p = f"{dst}/{t}.parquet"
            if not os.path.exists(p):
                shutil.copyfile(f"{SRC}/{t}.parquet", p)


def spark_walls(only: list[str] | None = None) -> list[tuple[str, float]]:
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry_mod

    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark import get_spark

    spark = get_spark("sf1-sweep")
    qs = entry_mod.queries()
    out = []
    runs = [(n, qs[n]) for n in QUERIES] + list(EXTRA_WALLS.items())
    if only:
        runs = [(n, fn) for n, fn in runs if n in only]
    for name, fn in runs:
        fn(spark, SRC).write.format("noop").mode("overwrite").save()  # warm
        t0 = time.perf_counter()
        fn(spark, DST).write.format("noop").mode("overwrite").save()
        out.append((name, time.perf_counter() - t0))
        print(f"sf1 wall {name}: {out[-1][1]:.2f}s", flush=True)
    spark.stop()
    return out


def main() -> None:
    # Modes (round 6: the one-shot form buried 50 min of output in a
    # buffering pipe and the parity phase ran past its budget — phases
    # are now separable and parity is per-query so a slow DuckDB replay
    # can be identified and timed out individually):
    #   python scripts/sf1_sweep.py build          # just the data dirs
    #   python scripts/sf1_sweep.py walls [q...]   # build + spark walls
    #   python scripts/sf1_sweep.py parity [q...]  # per-query oracle runs
    #   python scripts/sf1_sweep.py                # everything
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode in ("build", "walls", "all"):
        build()
        print("build done", flush=True)
    if mode in ("walls", "all"):
        walls = spark_walls(sys.argv[2:] if mode == "walls" else None)
        print("\n| query | sf1 wall s |\n|---|---|", flush=True)
        for name, dt in walls:
            print(f"| {name} | {dt:.2f} |", flush=True)
    if mode in ("parity", "all"):
        names = sys.argv[2:] if mode == "parity" and len(sys.argv) > 2 else QUERIES
        print("\noracle parity at 10x fold length (key subset):", flush=True)
        rc = 0
        for q in names:
            t0 = time.perf_counter()
            r = subprocess.run(
                [sys.executable,
                 os.path.join(REPO, "scripts/verify_local.py"), SUB, q],
            )
            print(f"parity {q}: rc={r.returncode}"
                  f" [{time.perf_counter() - t0:.0f}s]", flush=True)
            rc = rc or r.returncode
        sys.exit(rc)


if __name__ == "__main__":
    main()
