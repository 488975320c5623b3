"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop sink (full computation, no
driver-side collect bottleneck) — the number measures the engine, not
result serialization. Session warm-up (JVM + first parquet footer read) is
excluded via a warm-up pass, matching how the reference's 2-5 s Lambda
numbers exclude cold start (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = sf

    import __spark_entry__ as entry_mod
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark import get_spark

    spark = get_spark("ohlcv-bench")
    qs = entry_mod.queries()
    headline = getattr(entry_mod, "HEADLINE_QUERIES", list(qs))
    qs = {name: qs[name] for name in headline}

    # Warm-up: JVM codegen + file listing, tiny sf.
    warm = next(iter(qs.values()))
    warm(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name, fn in qs.items():
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_num,
            }
        )
    )


if __name__ == "__main__":
    main()
