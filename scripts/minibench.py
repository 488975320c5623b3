"""Mini-bench: time a subset of registry queries with the exact bench.py
discipline (get_spark conf, sf0.001 warm-up, clearCache+gc between runs,
best-of-N).  Usage: python scripts/minibench.py q1 q2 ... [--n 3]
"""
from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    argv = sys.argv[1:]
    n = 3
    args = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--n"):
            n = int(a.split("=")[1]) if "=" in a else int(argv[i + 1])
            i += 1 if "=" in a else 2
            continue
        args.append(a)
        i += 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry_mod
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark import get_spark

    spark = get_spark("ohlcv-minibench")
    qs = entry_mod.queries()
    names = args or list(qs)[:5]

    def _release() -> None:
        spark.catalog.clearCache()
        gc.collect()

    for name in names:
        qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    _release()
    for name in names:
        best, all_ts = None, []
        for _ in range(n):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            all_ts.append(dt)
            best = dt if best is None else min(best, dt)
            _release()
        print(f"{name}: best={best} runs={all_ts}")


if __name__ == "__main__":
    main()
