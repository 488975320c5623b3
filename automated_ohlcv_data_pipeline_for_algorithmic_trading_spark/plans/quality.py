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

__all__ = ["dq_report", "dq_unique_report", "psi_drift"]


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


def psi_drift(
    base: DataFrame,
    current: DataFrame,
    value_col: str,
    keys: Sequence[str] = (),
    bins: int = 20,
    lo: float = 0.0,
    hi: float = 1000.0,
) -> DataFrame:
    """Population-stability-index drift report between two slices of the
    same metric (the train-vs-serve / last-week-vs-this-week check a
    data pipeline runs before trusting new data): per key, the PSI of
    ``value_col``'s fixed-bin histogram, Laplace-smoothed so empty bins
    are defined. Convention: PSI < 0.1 stable, 0.1-0.25 moderate drift,
    > 0.25 investigate.

    Shape at scale: each side collapses to (key, bin) counts in one
    map-side-combinable aggregate (2 * keys * bins rows total regardless
    of input size); the PSI reduction over bins routes each term through
    decimal(38,12) so the sum is accumulation-order-free. Terms use
    ln(); both engines' libm agree far below the 1e-12 quantization, so
    the rounded PSI is engine-stable (same argument as the TF-IDF
    score).

    Output: (*keys, psi, n_base, n_current), psi rounded to 1e-6.
    """
    keys = list(keys)
    width = (hi - lo) / bins

    def binned(df: DataFrame, side: str) -> DataFrame:
        b = F.least(
            F.greatest(
                F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)), F.lit(0)
            ),
            F.lit(bins - 1),
        ).cast("int")
        return (
            df.filter(F.col(value_col).isNotNull())
            .groupBy(*keys, b.alias("bin"))
            .agg(F.count(F.lit(1)).alias(f"c_{side}"))
        )
    a = binned(base, "a")
    c = binned(current, "b")
    joined = a.join(c, [*keys, "bin"], "full").select(
        *keys,
        "bin",
        F.coalesce("c_a", F.lit(0)).alias("c_a"),
        F.coalesce("c_b", F.lit(0)).alias("c_b"),
    )
    w_tot = joined.groupBy(*keys).agg(
        F.sum("c_a").alias("n_a"), F.sum("c_b").alias("n_b")
    )
    j = joined.join(w_tot, keys) if keys else joined.crossJoin(w_tot)
    p = (F.col("c_a") + 1).cast("double") / (F.col("n_a") + bins).cast("double")
    q = (F.col("c_b") + 1).cast("double") / (F.col("n_b") + bins).cast("double")
    term = (p - q) * F.log(p / q)
    per_key = j.groupBy(*keys).agg(
        F.round(
            F.sum(term.cast("decimal(38,12)")).cast("double"), 6
        ).alias("psi"),
        F.min("n_a").cast("long").alias("n_base"),
        F.min("n_b").cast("long").alias("n_current"),
    )
    return per_key
