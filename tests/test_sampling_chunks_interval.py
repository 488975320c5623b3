"""Training-data curation operators: deterministic stratified sampling,
document chunking, and the bucketed interval join."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.joins import (
    interval_join,
)
from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.sampling import (
    stratified_sample,
)
from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.text import (
    chunk_documents,
)


def test_stratified_sample_deterministic_and_rate(spark):
    df = spark.range(0, 20000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 2 == 0, "big").otherwise("rare").alias("cls"),
    )
    out = stratified_sample(df, "cls", {"big": 1000, "rare": 10000}, "row_id")
    got = out.groupBy("cls").count().collect()
    counts = {r["cls"]: r["count"] for r in got}
    assert counts["rare"] == 10000  # rate 10000/10000 keeps everything
    assert 800 <= counts["big"] <= 1200  # ~10% of 10000, md5-uniform
    # deterministic: same selection on a different partitioning
    again = stratified_sample(
        df.repartition(13), "cls", {"big": 1000, "rare": 10000}, "row_id"
    )
    assert sorted(r["row_id"] for r in out.collect()) == sorted(
        r["row_id"] for r in again.collect()
    )


def test_chunk_documents_boundaries(spark):
    docs = spark.createDataFrame(
        [
            (0, " ".join(f"t{i}" for i in range(10))),   # 10 toks -> 1 chunk
            (1, " ".join(f"t{i}" for i in range(64))),   # exactly 64 -> 1
            (2, " ".join(f"t{i}" for i in range(65))),   # 65 -> 2 (overlap)
            (3, ""),                                     # empty -> none
        ],
        "doc_id long, text string",
    )
    rows = chunk_documents(docs, chunk_tokens=64, overlap=16).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[0]) == 1 and by_doc[0][0]["n_chunk_tokens"] == 10
    assert len(by_doc[1]) == 1 and by_doc[1][0]["n_chunk_tokens"] == 64
    assert len(by_doc[2]) == 2
    c0, c1 = sorted(by_doc[2], key=lambda r: r["chunk_idx"])
    assert c0["n_chunk_tokens"] == 64
    # second chunk starts at token 48: 65 - 48 = 17 tokens
    assert c1["n_chunk_tokens"] == 17
    assert c1["chunk_text"].split()[0] == "t48"  # 16-token overlap
    assert 3 not in by_doc


def test_interval_join_equals_theta_join(spark):
    t0 = dt.datetime(2024, 1, 1)
    points = spark.createDataFrame(
        [(1, i, t0 + dt.timedelta(minutes=7 * i)) for i in range(200)],
        "k long, pid long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (1, j, t0 + dt.timedelta(minutes=50 * j),
             t0 + dt.timedelta(minutes=50 * j + 90))
            for j in range(20)
        ],
        "k long, iid long, s timestamp, e timestamp",
    )
    fast = {
        (r["pid"], r["iid"])
        for r in interval_join(
            points, intervals, ["k"], "ts", "s", "e", bucket_seconds=3600
        ).collect()
    }
    slow = {
        (r["pid"], r["iid"])
        for r in points.join(intervals, "k")
        .filter((F.col("ts") >= F.col("s")) & (F.col("ts") < F.col("e")))
        .collect()
    }
    assert fast == slow and fast


def test_mixture_sample_quotas_and_determinism(spark):
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.sampling import (
        mixture_sample,
    )

    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(90)], "rid long, src string"
    )
    out = mixture_sample(df, "src", "rid", {"s0": 10, "s1": 25, "s2": 100})
    rows = out.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.src, []).append(r)
    # exact quota where available, everything when quota exceeds the pool
    assert {s: len(v) for s, v in by_src.items()} == {"s0": 10, "s1": 25, "s2": 30}
    # ranks are 1..n dense per source
    for v in by_src.values():
        assert sorted(r.pick_rank for r in v) == list(range(1, len(v) + 1))
    # deterministic under repartitioning
    again = mixture_sample(
        df.repartition(13), "src", "rid", {"s0": 10, "s1": 25, "s2": 100}
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # sources without a quota are dropped
    extra = mixture_sample(df, "src", "rid", {"s0": 5})
    assert {r.src for r in extra.collect()} == {"s0"}


class TestWeightedSample:
    def test_weight_proportional_and_deterministic(self, spark):
        from pyspark.sql import Row
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.sampling import (
            weighted_sample,
        )

        # 200 light docs (w=1) + 200 heavy docs (w=100): a 50-doc sample
        # should be dominated by heavy docs
        rows = [Row(doc_id=i, w=1) for i in range(200)] + [
            Row(doc_id=1000 + i, w=100) for i in range(200)
        ]
        df = spark.createDataFrame(rows)
        out1 = weighted_sample(df, "doc_id", "w", k=50).collect()
        heavy = sum(1 for r in out1 if r.doc_id >= 1000)
        assert heavy >= 40  # E[heavy] ~ 49.5 under w=100:1
        assert len(out1) == 50
        assert sorted(r.ws_rank for r in out1) == list(range(1, 51))
        # determinism: identical selection on a different partitioning
        out2 = weighted_sample(df.repartition(13), "doc_id", "w", k=50).collect()
        assert sorted(r.doc_id for r in out1) == sorted(r.doc_id for r in out2)

    def test_strata_independent_reservoirs(self, spark):
        from pyspark.sql import Row
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.sampling import (
            weighted_sample,
        )

        rows = [
            Row(doc_id=i, src="a" if i % 2 == 0 else "b", w=i + 1)
            for i in range(100)
        ]
        df = spark.createDataFrame(rows)
        out = weighted_sample(df, "doc_id", "w", k=10, strata="src").collect()
        by_src = {}
        for r in out:
            by_src.setdefault(r.src, []).append(r.ws_rank)
        assert sorted(by_src["a"]) == list(range(1, 11))
        assert sorted(by_src["b"]) == list(range(1, 11))
