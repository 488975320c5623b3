"""Physical-plan assertions: the plans we designed for are the plans
Catalyst actually produces (pushdown, pruning, broadcast, top-k). These
are the properties that make the operators survive a 100x scale-up."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F


def physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized(df) -> str:
    return df._jdf.queryExecution().toString()


def test_filter_pushdown_to_parquet(spark, sf_dir):
    import __spark_entry__ as E

    plan = physical(E.q01_pricing_summary(spark, sf_dir))
    assert "PushedFilters: [" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200]


def test_column_pruning(spark, sf_dir):
    import __spark_entry__ as E

    plan = physical(E.e_symbol_stats(spark, sf_dir))
    # scan schema must not include unused columns like props/event_type
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "props" not in read_schema and "event_type" not in read_schema


def test_broadcast_join_for_dims(spark, sf_dir):
    import __spark_entry__ as E

    plan = physical(E.q03_top_order_revenue(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_topk_is_take_ordered(spark, sf_dir):
    import __spark_entry__ as E

    plan = physical(E.e_tail_limit(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_partition_pruning_on_silver(spark, tmp_path):
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.plans.analytics import (
        symbol_stats,
    )
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.plans.etl import (
        bronze_to_silver,
        write_silver,
    )
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.sources.mock import (
        write_mock_envelope_files,
    )
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.sources.raw_json import (
        read_raw_envelopes,
    )

    raw_dir = tmp_path / "raw"
    raw_dir.mkdir()
    write_mock_envelope_files(spark, str(raw_dir), ["NSE:RELIANCE-EQ", "NSE:TCS-EQ"], days=2)
    silver_path = str(tmp_path / "silver")
    write_silver(bronze_to_silver(read_raw_envelopes(spark, str(raw_dir))), silver_path)
    silver = spark.read.parquet(silver_path)
    plan = physical(symbol_stats(silver, "RELIANCE", "2024-01-01"))
    # the (symbol_clean, dt) predicate must land in PartitionFilters,
    # not a post-scan Filter
    pf = plan.split("PartitionFilters:")[1][:400]
    assert "symbol_clean" in pf and "dt" in pf


def test_no_python_udfs_in_core_queries(spark, sf_dir):
    """Everything except the explicit mapInPandas multimodal path must stay
    JVM-side (no BatchEvalPython / ArrowEvalPython in the plan)."""
    import __spark_entry__ as E

    for name in ("q01_pricing_summary", "e_daily_rollup", "d_token_stats",
                 "d_minhash_neardup", "emb_ann_topk"):
        plan = physical(E.queries()[name](spark, sf_dir))
        assert "EvalPython" not in plan, f"{name} fell off the JVM fast path"


def test_gapfill_plan_has_no_cartesian_or_bnlj(spark, sf_dir):
    """resample_gapfill's grid join must stay an equi join: a cartesian
    or nested-loop plan would explode at (keys x buckets) scale."""
    import __spark_entry__ as E

    df = E.queries()["e_resample_gapfill"](spark, sf_dir)
    plan = physical(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_atr_windows_share_one_exchange(spark, sf_dir):
    """true_range's lag and atr's rolling mean partition identically —
    Catalyst must plan ONE per-key exchange, not two."""
    import __spark_entry__ as E

    df = E.queries()["x_atr_daily"](spark, sf_dir)
    plan = physical(df)
    # exchanges: the daily-rollup agg, the per-user window, the final
    # sort (+AQE reuse nodes); a second window exchange would add one
    n_hash_exchanges = plan.count("Exchange hashpartitioning")
    assert n_hash_exchanges <= 2, plan[:4000]


def test_merge_semi_join_path_plan_is_bounded(spark, tmp_path):
    """Above the literal threshold the merge plan must not carry a
    per-partition OR chain: plan size stays ~constant as touched
    partitions grow (here: read path built the same way merge builds
    its pruned 'existing' frame)."""
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.plans.merge import (
        merge_into_parquet,
    )

    path = str(tmp_path / "tbl")
    rows = [("S%03d" % i, "2024-01-01", 1, float(i), 0) for i in range(100)]
    df = spark.createDataFrame(
        rows, "sym string, dt string, t long, v double, seq long"
    )
    merge_into_parquet(spark, path, df, ["sym", "dt", "t"], ["sym", "dt"])
    # second merge takes the semi-join branch (100 > 64): just assert it
    # completes and the table stays correct — plan boundedness is implied
    # by construction (a single join node replaces 100 OR terms), and the
    # literal branch's OR chain is exercised by the other merge tests
    merge_into_parquet(spark, path, df, ["sym", "dt", "t"], ["sym", "dt"])
    assert spark.read.parquet(path).count() == 100


class TestOrcSourceSink:
    def test_roundtrip_preserves_types_and_values(self, spark, tmp_path):
        from pyspark.sql import Row
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.sources.orc import (
            read_orc,
            write_orc,
        )
        import datetime

        df = spark.createDataFrame(
            [
                Row(user_id=1, trade_date=datetime.date(2024, 1, 1),
                    close=1.25, volume=10),
                Row(user_id=2, trade_date=datetime.date(2024, 1, 2),
                    close=-0.5, volume=0),
            ]
        )
        p = str(tmp_path / "orc_rt")
        write_orc(df, p, bloom_columns=["user_id"])
        back = read_orc(spark, p)
        assert dict(back.dtypes) == dict(df.dtypes)
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))

    def test_partitioned_write_prunes(self, spark, tmp_path):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.sources.orc import (
            read_orc,
            write_orc,
        )

        df = spark.range(100).selectExpr("id", "id % 4 as part")
        p = str(tmp_path / "orc_part")
        write_orc(df, p, partition_by=["part"])
        back = read_orc(spark, p).filter("part = 2")
        assert back.count() == 25
        # partition pruning: the scan's PartitionFilters must carry the
        # part=2 predicate (not merely mention the word somewhere)
        plan = back._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert m is not None, plan
        assert "part" in m.group(1) and "2" in m.group(1), m.group(1)


def test_keltner_windows_share_one_exchange(spark, sf_dir):
    """keltner's TR lag + both rolling means partition identically —
    Catalyst must plan ONE per-key window exchange (plus the rollup agg
    and final sort), not one per window frame."""
    import __spark_entry__ as E

    df = E.queries()["x_keltner"](spark, sf_dir)
    plan = physical(df)
    n_hash_exchanges = plan.count("Exchange hashpartitioning")
    assert n_hash_exchanges <= 2, plan[:4000]
