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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_permyriad(id_col: str) -> Column:
    """md5-derived uniform value in [0, 10000) from the row id — the
    sampling coin. Same formula as the DuckDB twin:
    CAST('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8) AS BIGINT) % 10000."""
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string").cast("binary")), 1, 8), 16, 10
    ).cast("long")
    return h % 10000


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: tuple[tuple[str, int], ...] = (("train", 9000), ("val", 500), ("test", 500)),
    salt: str = "split-v1",
) -> DataFrame:
    """Deterministic train/val/test assignment — the dataset-split step of
    a training pipeline, done the reproducible way: the split is a pure
    function of (salt, id), so it survives re-runs, cluster resizes, and
    engine swaps (the DuckDB twin replays it bit-for-bit), and adding new
    rows never reshuffles old ones between splits.

    ``splits`` are (name, weight-permyriad) in priority order and must sum
    to 10000. Row goes to the first split whose cumulative range contains
    ``md5(salt|id) % 10000``. Pure per-row expression: no shuffle, no RNG,
    embarrassingly parallel at 100 TB.

    Output: (id_col, split_bucket, split).
    """
    total = sum(w for _, w in splits)
    if total != 10000:
        raise ValueError(f"split weights must sum to 10000, got {total}")
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    bucket = (h % 10000).alias("split_bucket")
    expr: Column = F.lit(splits[-1][0])
    upper = 0
    edges = []
    for name, weight in splits:
        upper += weight
        edges.append((name, upper))
    for name, edge in reversed(edges[:-1]):
        expr = F.when(F.col("split_bucket") < edge, F.lit(name)).otherwise(expr)
    return df.select(id_col, bucket).withColumn("split", expr)


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


def mixture_sample(
    df: DataFrame,
    source_col: str,
    id_col: str,
    quotas: dict[str, int],
    salt: str = "mix-v1",
) -> DataFrame:
    """Dataset mixture composition: take exactly ``quotas[source]`` rows
    per source (or all of a source when it has fewer) — the "30% web,
    50% code, 20% papers" step that turns curated pools into a training
    mixture. Selection within a source is by md5-hash rank, so the
    sample is a deterministic function of (salt, id): re-runs, engine
    swaps, and cluster resizes pick the same rows.

    One window per source partition (rank by (hash, id) — the id
    tiebreak makes the order total even on hash collisions) and a
    literal CASE for the quota: single shuffle on the source key, no
    driver-side loops. Sources not in ``quotas`` are dropped.

    Output: input columns + ``pick_rank`` (1-based rank within source).
    """
    sources = sorted(quotas)
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string"))),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    quota: Column = F.lit(0)
    for s in sources:
        quota = F.when(F.col(source_col) == s, F.lit(int(quotas[s]))).otherwise(
            quota
        )
    w = Window.partitionBy(source_col).orderBy(h, F.col(id_col))
    return (
        df.filter(F.col(source_col).isin(sources))
        .withColumn("pick_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("pick_rank") <= quota)
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    strata: str | None = None,
    salt: str = "ws-v1",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement — the
    Efraimidis–Spirakis one-pass reservoir (keep the k largest
    u^(1/w), here as the k largest ln(u)/w), with the uniform u derived
    from md5(id || salt) instead of RNG state. Inclusion probability is
    proportional to weight, the SAME rows are selected on any cluster
    size, and the DuckDB oracle replays the formula verbatim — the
    reproducibility contract of the other samplers, extended to
    weighted mixture construction (sample documents ∝ length, domains
    ∝ quality mass, ...).

    Per ``strata`` (optional) the top-k ranking is one window over the
    stratum key; weights are clamped to >= 1e-9 so zero/negative
    weights degrade to (effectively never sampled unless the stratum
    runs out of positive-weight rows) rather than dividing by zero —
    fractional weights like quality scores in (0, 1] keep their exact
    proportional meaning. Ranking ties on the float key are broken by
    id — and the md5-derived keys make exact ties impossible, so the
    selection is total-ordered.

    Output: input columns + (ws_key, ws_rank) for the k selected rows.
    """
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col(id_col).cast("string"), F.lit("#" + salt)
                    ).cast("binary")
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(16**12 + 1))
    w = F.greatest(F.col(weight_col).cast("double"), F.lit(1e-9))
    key = F.log(u) / w
    part = [strata] if strata else []
    win = Window.partitionBy(*part).orderBy(
        F.col("ws_key").desc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("ws_key", key)
        .withColumn("ws_rank", F.row_number().over(win).cast("long"))
        .filter(F.col("ws_rank") <= k)
    )
