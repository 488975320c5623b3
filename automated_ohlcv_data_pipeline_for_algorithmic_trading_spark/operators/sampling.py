"""Deterministic sampling for training-data curation (beyond-reference
surface, BASELINE.json north star).

Hash-based Bernoulli sampling: a row survives iff
``md5(id) % 10000 < rate_permyriad``. No RNG state and no partitioning
dependence — the SAME rows are selected on any cluster size, any engine
(the DuckDB oracle replays the predicate verbatim), and re-runs
reproduce the same corpus, which is the property a training-data
pipeline actually needs from sampling. Per-stratum rates make it
stratified: downsample dominant classes, keep rare classes whole.
``df.sample()`` by contrast is seed+partition-layout dependent and not
replayable cross-engine.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_permyriad(id_col: str) -> Column:
    """md5-derived uniform value in [0, 10000) from the row id — the
    sampling coin. Same formula as the DuckDB twin:
    CAST('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8) AS BIGINT) % 10000."""
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string").cast("binary")), 1, 8), 16, 10
    ).cast("long")
    return h % 10000


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    rates_permyriad: Mapping[str, int],
    id_col: str,
    default_permyriad: int = 0,
) -> DataFrame:
    """Keep each row with its stratum's probability (permyriad = per
    10,000; 10000 keeps everything). One codegen'd filter — no shuffle,
    no RNG; scales linearly and prunes at the scan when the stratum
    column is a partition key."""
    rate: Column = F.lit(int(default_permyriad))
    for value, permyriad in sorted(rates_permyriad.items()):
        rate = F.when(F.col(stratum_col) == value, F.lit(int(permyriad))).otherwise(
            rate
        )
    return df.filter(hash_permyriad(id_col) < rate)
