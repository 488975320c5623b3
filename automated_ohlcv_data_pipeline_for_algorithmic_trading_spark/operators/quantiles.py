"""Exact distributed quantile bucketing without a global sort.

The scale problem with ``ntile(k)`` is that it ranks every row in one
total order — a corpus-wide sort (single-partition window) that dies at
100 TB. For INTEGER-valued metrics there is an exact alternative: the
distinct-value HISTOGRAM is bounded by the value range (not the row
count), its cumulative counts locate the k−1 discrete cut values, and
every row classifies by comparison against those broadcast scalars.
``ccnet_buckets`` (operators/corpus.py) inlines this pattern for xent
terciles; this module is the generic operator (RFM scoring, VaR bands,
any score→bucket mapping).

Semantics are ``quantile_disc``: cut b is the smallest value whose
cumulative count covers ceil(b·N/k); ties (equal values) always share a
bucket, so buckets can be uneven on heavily tied data — the price of
exactness, and what CCNet/pandas ``qcut(duplicates='drop')`` do too.
All arithmetic is integer (3·ccum >= b·N — no division), so the result
is bit-identical in any engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .rank import distributed_running_sum

__all__ = ["quantile_bucket"]


def quantile_bucket(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 5,
    out_col: str = "bucket",
    strategy: str = "twopass",
) -> DataFrame:
    """Append an exact discrete-quantile bucket (1..n_buckets, 1 =
    smallest values) for the INTEGER column ``value_col``.

    One histogram aggregate (map-side combinable, output bounded by the
    distinct-value count), the k−1 cut values from that bounded
    histogram, then a broadcast compare per input row:
    ``bucket = 1 + Σ_b (value > cut_b)``. NULL values get NULL buckets.

    ``strategy`` picks how the cuts are found:

    - ``"twopass"`` (default): the distributed prefix sum from
      operators/rank.py — scales to unbounded distinct-value counts
      (histogram sharded across partitions) but runs two eager jobs at
      call time. The safe default: correct for metrics whose distinct
      count is row-count-shaped (per-key sums, quasi-continuous
      micro-unit amounts).
    - ``"packed"``: sort the histogram into ONE array and run a single
      in-array fold that carries (running count, k−1 pending cuts) —
      entirely LAZY (no job until the result is consumed) and one
      aggregation total. OPT-IN: the whole histogram passes through one
      aggregation buffer, so callers must guarantee the distinct-value
      count is bounded BY CONSTRUCTION (~10^4 — day counts, score
      grids), not merely small in the test data.

    Both produce identical cuts: cut_b = min v with ccum·k ≥ N·b, all
    integer arithmetic.
    """
    if n_buckets < 2:
        raise ValueError("quantile_bucket: n_buckets must be >= 2")
    v = F.col(value_col)
    hist = df.filter(v.isNotNull()).groupBy(v.alias("_v")).agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    k = n_buckets
    if strategy == "twopass":
        # two-pass distributed prefix sum over the histogram (the
        # grouped keys are distinct, so "_v" alone is a total order);
        # the grand total rides along as a literal
        cum = distributed_running_sum(
            hist, [F.col("_v").asc()], "_cnt", "_ccum", total_col="_n"
        )
        cuts = cum.agg(
            *[
                F.min(
                    F.when(
                        F.col("_ccum") * k >= F.col("_n") * b, F.col("_v")
                    )
                ).alias(f"_cut{b}")
                for b in range(1, k)
            ]
        )
    else:
        vtype = df.schema[value_col].dataType
        packed = hist.agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("_v"), F.col("_cnt")))
            ).alias("_h")
        ).select(
            "_h",
            F.aggregate(
                "_h", F.lit(0).cast("long"), lambda a, x: a + x["_cnt"]
            ).alias("_n"),
        )

        def _step(acc: Column, x: Column) -> Column:
            s2 = acc["s"] + x["_cnt"]
            return F.struct(
                s2.alias("s"),
                *[
                    F.coalesce(
                        acc[f"c{b}"],
                        F.when(s2 * k >= F.col("_n") * b, x["_v"]),
                    ).alias(f"c{b}")
                    for b in range(1, k)
                ],
            )

        init = F.struct(
            F.lit(0).cast("long").alias("s"),
            *[
                F.lit(None).cast(vtype).alias(f"c{b}")
                for b in range(1, k)
            ],
        )
        cuts = packed.select(F.aggregate("_h", init, _step).alias("_f")).select(
            *[F.col("_f")[f"c{b}"].alias(f"_cut{b}") for b in range(1, k)]
        )
    bucket: Column = F.lit(1)
    for b in range(1, n_buckets):
        bucket = bucket + (v > F.col(f"_cut{b}")).cast("int")
    bucket = F.when(v.isNotNull(), bucket)
    return (
        df.crossJoin(F.broadcast(cuts))
        .withColumn(out_col, bucket)
        .drop(*[f"_cut{b}" for b in range(1, n_buckets)])
    )
