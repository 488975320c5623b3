"""Scale smoke for operators/rank.distributed_row_number.

Round-7 ran this ad hoc at 20M/100M rows; the 100M back-to-back repeat
hit single-JVM GC pressure because the harness still HELD the first
pass's localCheckpoint blocks while the second pass ranked (the r7
VERDICT flagged it as a harness artifact). This script is the clean
version: after each pass the result reference is dropped and collected
so the ContextCleaner releases the checkpoint blocks before the next
pass starts — on a real cluster the blocks spread across executors and
the issue never exists.

Usage: python scripts/scale_smoke_rank.py [n_rows] [n_keys] [passes]
(defaults 100_000_000 / 10_000_000 / 2). Each pass is checksum-verified
(sum of ranks == n(n+1)/2).
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    n_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark import get_spark
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.rank import (
        distributed_row_number,
    )

    spark = get_spark("rank-scale-smoke")
    sc = spark.sparkContext
    par = sc.defaultParallelism * 2

    # deterministic synthetic (key, id): key is NOT unique (10 rows/key
    # on the defaults) so the rank's tie-break column does real work
    base = (
        spark.range(0, n_rows, 1, par)
        .select(
            (F.col("id") % n_keys).alias("k"),
            F.col("id"),
        )
        .localCheckpoint()
    )
    base.count()  # materialize the input outside the timed region
    expect = n_rows * (n_rows + 1) // 2

    def keep_ids() -> set[int]:
        it = sc._jsc.sc().getPersistentRDDs().keysIterator()
        ids = set()
        while it.hasNext():
            ids.add(it.next())
        return ids

    base_ids = keep_ids()

    def drop_pass_blocks() -> None:
        # blocking-unpersist every checkpoint the pass created (the rank
        # operator checkpoints its range-stamped input internally) so the
        # next pass starts with the blocks GONE, not queued on the async
        # ContextCleaner — the r7 harness raced the cleaner and measured
        # GC pressure instead of the operator.
        jsc = sc._jsc.sc()
        it = jsc.getPersistentRDDs().keysIterator()
        while it.hasNext():
            rid = it.next()
            if rid not in base_ids:
                jsc.getPersistentRDDs().apply(rid).unpersist(True)

    for p in range(passes):
        t0 = time.time()
        ranked = distributed_row_number(
            base, [F.col("k").asc(), F.col("id").asc()], rank_col="_rk",
            num_partitions=64,
        )
        got = ranked.agg(F.sum("_rk")).collect()[0][0]
        wall = time.time() - t0
        ok = got == expect
        print(
            f"pass {p}: {wall:.1f} s, checksum {'OK' if ok else 'MISMATCH'} "
            f"({n_rows} rows, {n_keys} keys, {n_rows / wall / 1e6:.2f} M rows/s)"
        )
        assert ok
        # drop the pass's checkpoint blocks BEFORE the next pass ranks
        # (the r7 harness kept them alive -> GC pressure on a single JVM)
        del ranked
        gc.collect()
        drop_pass_blocks()

    spark.stop()


if __name__ == "__main__":
    main()
