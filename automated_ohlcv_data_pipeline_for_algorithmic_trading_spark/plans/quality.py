"""Declarative data-quality gate: violation counts for a rule set in one
pass — the check layer the reference runs ad hoc inside its ETL
(etl/lightweight_etl.py:85 `close > 0`, etl/glue_job.py:178-186 DQ
filters, sql/rds_schema.sql:112-125 monitoring view) generalized into a
reusable report.

Scale shape: all predicate rules evaluate in ONE map-side-combinable
aggregate over a single scan (one row of conditional sums, unpivoted to
a row per rule), regardless of rule count; a uniqueness rule needs its
own keyed aggregate (duplicates are a property of the key group, not the
row) — one hash shuffle on the key, counted map-side first. The report
is rows of (rule, n_violations, n_rows): feed it to a circuit breaker
(fail the pipeline when a count exceeds a budget) or a monitoring sink.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["dq_report", "dq_unique_report"]


def dq_report(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """One row per rule: (rule, n_violations, n_rows). Each value in
    ``rules`` is the VIOLATION predicate (true = bad row). Evaluated in
    a single aggregate pass over one scan."""
    aggs = [F.count(F.lit(1)).alias("_total")] + [
        F.sum(F.when(pred, 1).otherwise(0)).alias(f"_v{i}")
        for i, pred in enumerate(rules.values())
    ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', _v{i}" for i, name in enumerate(rules)
    )
    return wide.selectExpr(
        f"stack({len(rules)}, {stack_args}) AS (rule, n_violations)",
        "_total AS n_rows",
    ).select("rule", "n_violations", "n_rows")


def dq_unique_report(
    df: DataFrame, keys: Sequence[str], rule_name: str | None = None
) -> DataFrame:
    """Uniqueness rule: n_violations = number of rows carrying a
    duplicated key (rows in excess of one per key). Same report schema
    as ``dq_report`` so the two union into one gate."""
    keys = list(keys)
    name = rule_name or ("unique_" + "_".join(keys))
    per_key = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("_c"))
    return per_key.agg(
        F.sum(F.col("_c") - 1).cast("long").alias("n_violations"),
        F.sum("_c").cast("long").alias("n_rows"),
    ).select(
        F.lit(name).alias("rule"),
        F.coalesce("n_violations", F.lit(0)).alias("n_violations"),
        F.coalesce("n_rows", F.lit(0)).alias("n_rows"),
    )
