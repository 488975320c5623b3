"""Bucketed-join plan test: both sides bucketed on the join key ->
SortMergeJoin with no Exchange (the shuffle-free co-located join that
makes repeated fact-fact joins viable at 100 TB)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.sources.bucketed import (
    read_table,
    write_bucketed,
)
from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.sources.tables import (
    load_table,
)


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    # spark.sql.warehouse.dir is static; tables land in ./spark-warehouse
    # (gitignored) and are dropped at the end
    spark.sql("CREATE DATABASE IF NOT EXISTS bkt")
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    write_bucketed(ev.select("event_id", "user_id", "value"), "bkt.ev",
                   ["user_id"], num_buckets=8, sort_cols=["user_id"])
    write_bucketed(daily, "bkt.daily", ["user_id"], num_buckets=8,
                   sort_cols=["user_id"])
    joined = read_table(spark, "bkt.ev").join(
        read_table(spark, "bkt.daily").hint("merge"), "user_id"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, "bucketed join still shuffles"
    # and it computes the right thing
    assert joined.count() > 0
    spark.sql("DROP TABLE IF EXISTS bkt.ev")
    spark.sql("DROP TABLE IF EXISTS bkt.daily")
