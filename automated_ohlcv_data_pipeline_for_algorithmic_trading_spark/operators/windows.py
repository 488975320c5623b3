"""Window functions (SURVEY.md SS2.5, W1-W5): day summaries via analytic
windows, and the declared rolling indicators sma_20 / rsi_14
(examples/README.md:100-104 — declared in the reference's API surface but
never implemented there; here they are native window expressions).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def daily_window_summary(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    open_col: str,
    close_col: str,
    volume_col: str | None = None,
    date_alias: str = "trade_date",
) -> DataFrame:
    """W1-W4 — the Athena daily-summary pattern
    (sql/athena_parquet_tables.sql:117-144): first_value(open) /
    last_value(close) over (key, date) ordered by ts with a full frame,
    SUM(volume) over the unordered partition, then DISTINCT to one row per
    day, plus ``daily_return_percent``.

    Kept as a faithful window-based twin of the reference SQL; the groupBy
    rollup (rollup.daily_rollup) computes the same thing with one shuffle
    and map-side combine — prefer it at scale.
    """
    d = F.to_date(F.col(ts_col)).alias(date_alias)
    base = df.withColumn(date_alias, d)
    part = [*keys, date_alias]
    w_ord = Window.partitionBy(*part).orderBy(F.col(ts_col))
    w_full = w_ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    w_part = Window.partitionBy(*part)
    out = (
        base.withColumn("day_open", F.first(open_col).over(w_ord))
        .withColumn("day_close", F.last(close_col).over(w_full))
    )
    if volume_col:
        out = out.withColumn(
            "day_volume", F.sum(F.col(volume_col).cast("decimal(38,6)")).over(w_part).cast("double")
        )
    cols = [*part, "day_open", "day_close"] + (["day_volume"] if volume_col else [])
    out = out.select(*cols).distinct()
    return out.withColumn(
        "daily_return_percent",
        F.when(
            F.col("day_open") != 0,
            (F.col("day_close") - F.col("day_open")) / F.col("day_open") * 100.0,
        ).otherwise(F.lit(0.0)),
    )


def sma(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    n: int = 20,
    out_col: str | None = None,
    min_periods: int = 1,
    skew_safe: bool | str = "auto",
    tiebreak: str | None = None,
) -> DataFrame:
    """W5 — simple moving average over the trailing ``n`` rows per key.

    Window sums accumulate in ORDER BY order, so the result is
    deterministic without decimal routing. Rows earlier than
    ``min_periods`` still emit (pandas ``rolling(min_periods=1)``
    semantics); pass ``min_periods=n`` for strict SMA.

    ``skew_safe`` (default ``"auto"``): when ``ts_col`` is a
    timestamp/date column, route through :func:`sma_chunked` with a
    per-day chunk so one pathologically hot key never sorts in a single
    task (bit-identical output — the chunk carry reconstructs exactly
    the global trailing frame; measured 19.9 s -> 7.6 s on a 95%-hot
    key, SCALE_RESULTS.md). Numeric ``ts_col`` has no derivable chunk
    width, so it stays on the single-window form unless the caller uses
    :func:`sma_chunked` with an explicit ``chunk``. Pass
    ``skew_safe=False`` to force the plain global window.
    """
    out_col = out_col or f"sma_{n}"
    if skew_safe in (True, "auto"):
        from pyspark.sql.types import DateType, TimestampType

        if isinstance(df.schema[ts_col].dataType, (TimestampType, DateType)):
            return sma_chunked(
                df, keys, ts_col, value_col, n=n, out_col=out_col,
                min_periods=min_periods, tiebreak=tiebreak,
            )
        if skew_safe is True:
            raise ValueError(
                f"skew_safe=True needs a timestamp/date {ts_col!r} to derive "
                "a chunk; use sma_chunked(..., chunk=...) for numeric ts"
            )
    order_cols = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(*keys).orderBy(*order_cols).rowsBetween(-(n - 1), 0)
    avg = F.avg(value_col).over(w)
    if min_periods > 1:
        cnt = F.count(value_col).over(w)
        avg = F.when(cnt >= min_periods, avg)
    return df.withColumn(out_col, avg)


def sma_chunked(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    n: int = 20,
    out_col: str | None = None,
    min_periods: int = 1,
    chunk: F.Column | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Skew-robust SMA: identical to :func:`sma`, but the window
    partitions on ``(keys, chunk)`` instead of ``keys`` alone, so one
    pathologically hot key (90-99% of all rows) spreads across chunks
    instead of sorting in a single task (measured 24.6s -> ~2s on a
    95%-hot key at 12M rows, SCALE_RESULTS.md).

    Mechanics: a chunk's trailing rows are copied into LATER chunks
    with data for that key (gap-safe: the chunk list is ranked, not
    calendar-incremented), flagged, used only as trailing history, and
    dropped from the output. Which rows go where is size-pruned to the
    exact requirement: a source row with ``j-1`` rows after it in its
    own chunk is needed by destination chunk ``d`` iff
    ``j - 1 + (rows in the chunks between) <= n - 2`` — so each
    (src, dst) hop carries ``needed = (n-1) - intervening_rows`` rows,
    computed from per-chunk row counts + one cumulative sum over the
    tiny ranked chunk list. Fat chunks therefore carry only their last
    ``n-1`` rows one hop forward (intervening >= n-1 kills farther
    hops); arbitrarily THIN chunks fan out across as many prior chunks
    as it takes to reconstruct the full ``n-1``-row history — the
    reconstruction is EXACT with no minimum-rows-per-chunk
    precondition, and total carry volume is <= ``n-1`` rows per
    DESTINATION chunk regardless of the size distribution. ``chunk``
    defaults to ``to_date(ts_col)`` and must be monotone in ``ts_col``.
    """
    out_col = out_col or f"sma_{n}"
    base = df.withColumn(
        "_chunk", chunk if chunk is not None else F.to_date(F.col(ts_col))
    )
    order_cols = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    # ranked chunk list per key with per-chunk row counts and the
    # cumulative row count up to & including each chunk (tiny table:
    # one row per non-empty (key, chunk))
    sizes = base.groupBy(*keys, "_chunk").agg(F.count(F.lit(1)).alias("_csize"))
    wn = Window.partitionBy(*keys).orderBy(F.col("_chunk"))
    ranked = sizes.withColumn("_crank", F.row_number().over(wn)).withColumn(
        "_cum", F.sum("_csize").over(wn.rowsBetween(Window.unboundedPreceding, 0))
    )
    src = ranked.select(
        *keys,
        F.col("_chunk"),
        F.col("_crank").alias("_rank_src"),
        F.col("_cum").alias("_cum_src"),
    )
    dst = ranked.select(
        *keys,
        F.col("_chunk").alias("_dst_chunk"),
        F.col("_crank").alias("_rank_dst"),
        (F.col("_cum") - F.col("_csize")).alias("_cum_before_dst"),
    )
    # rows in the chunks strictly between src and dst; a hop is kept
    # only while dst still needs history from src
    needed = F.lit(n - 1) - (F.col("_cum_before_dst") - F.col("_cum_src"))
    hops = (
        src.join(dst, list(keys))
        .filter(
            (F.col("_rank_dst") > F.col("_rank_src"))
            & (F.col("_rank_dst") <= F.col("_rank_src") + (n - 1))
            & (needed >= 1)
        )
        .select(*keys, "_chunk", "_dst_chunk", needed.alias("_needed"))
    )
    wr = Window.partitionBy(*keys, "_chunk").orderBy(
        *[c.desc() for c in order_cols]
    )
    carry = (
        base.withColumn("_rdesc", F.row_number().over(wr))
        .filter(F.col("_rdesc") <= n - 1)
        .join(hops, [*keys, "_chunk"])
        .filter(F.col("_rdesc") <= F.col("_needed"))
        .drop("_rdesc", "_needed")
        .withColumn("_chunk", F.col("_dst_chunk"))
        .drop("_dst_chunk")
        .withColumn("_carry", F.lit(1))
    )
    allrows = base.withColumn("_carry", F.lit(0)).unionByName(carry)
    w = (
        Window.partitionBy(*keys, "_chunk")
        .orderBy(*order_cols)
        .rowsBetween(-(n - 1), 0)
    )
    avg = F.avg(value_col).over(w)
    if min_periods > 1:
        cnt = F.count(value_col).over(w)
        avg = F.when(cnt >= min_periods, avg)
    return (
        allrows.withColumn(out_col, avg)
        .filter(F.col("_carry") == 0)
        .drop("_carry", "_chunk")
    )


def rsi(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    n: int = 14,
    out_col: str | None = None,
) -> DataFrame:
    """W5 — Relative Strength Index over ``n`` periods (simple-average
    variant): delta = value - lag(value); gain/loss = clipped deltas;
    rolling n-row averages; RSI = 100 - 100/(1+avg_gain/avg_loss).

    Emits NULL for the first ``n`` rows per key (insufficient history);
    100.0 when avg_loss is 0 (all gains), 0.0 when avg_gain is 0.
    """
    out_col = out_col or f"rsi_{n}"
    w_lag = Window.partitionBy(*keys).orderBy(F.col(ts_col))
    w_roll = w_lag.rowsBetween(-(n - 1), 0)
    v = F.col(value_col)
    delta = v - F.lag(v, 1).over(w_lag)
    gain = F.when(delta > 0, delta).otherwise(F.lit(0.0))
    loss = F.when(delta < 0, -delta).otherwise(F.lit(0.0))
    tmp = (
        df.withColumn("_delta", delta)
        .withColumn("_gain", gain)
        .withColumn("_loss", loss)
    )
    # count of non-null deltas in the frame gates warm-up
    n_deltas = F.count("_delta").over(w_roll)
    avg_gain = F.avg(F.when(F.col("_delta").isNotNull(), F.col("_gain"))).over(w_roll)
    avg_loss = F.avg(F.when(F.col("_delta").isNotNull(), F.col("_loss"))).over(w_roll)
    rsi_expr = (
        F.when(n_deltas < n, F.lit(None).cast("double"))
        .when(avg_loss == 0, F.lit(100.0))
        .otherwise(100.0 - 100.0 / (1.0 + avg_gain / avg_loss))
    )
    return tmp.withColumn(out_col, rsi_expr).drop("_delta", "_gain", "_loss")


def rolling_zscore(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str | Sequence[str],
    value_col: str = "value",
    n: int = 50,
    min_obs: int = 10,
    out_col: str = "zscore",
) -> DataFrame:
    """Rolling z-score per key series: how many sample standard deviations
    the current value sits from the trailing ``n``-row mean — the
    monitoring primitive behind threshold alerting (the reference's
    volatility screen, monitoring/dashboard.py shape, generalized).

    Mean and SAMPLE stddev come from exact decimal window sums of value
    and value^2 (functions/exact.py discipline), so the double z-score is
    partition-count-invariant and bit-replayable by any engine that sums
    the same decimals — the window twin of dispersion_stats. Rows with
    fewer than ``min_obs`` trailing observations emit NULL (warm-up), and
    a zero-variance window emits NULL (a flat series has no scale).
    """
    dec = "decimal(38,6)"
    order = [ts_col] if isinstance(ts_col, str) else list(ts_col)
    w_ord = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order])
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    w = w_ord.rowsBetween(-(n - 1), 0)
    v = F.col(value_col)
    cnt = F.count(v).over(w).cast("double")
    # Sliding decimal sums via prefix-sum difference: Spark re-aggregates
    # a [-(n-1), 0] frame per row (O(rows x n) — one run measured 83 s on
    # 600k rows from the decimal churn alone), while a cumulative frame
    # is O(rows). Decimal arithmetic is EXACT, so cum - lag(cum, n) is
    # bit-identical to summing the frame directly — the oracle's direct
    # frame sums land on the same decimals.
    zero = F.lit(0).cast(dec)
    staged = df.withColumn("_cx", F.sum(v.cast(dec)).over(w_cum)).withColumn(
        "_cxx", F.sum((v * v).cast(dec)).over(w_cum)
    )
    sx = (
        F.col("_cx") - F.coalesce(F.lag("_cx", n).over(w_ord), zero)
    ).cast("double")
    sxx = (
        F.col("_cxx") - F.coalesce(F.lag("_cxx", n).over(w_ord), zero)
    ).cast("double")
    mean = sx / cnt
    var = (cnt * sxx - sx * sx) / (cnt * (cnt - 1.0))
    sd = F.sqrt(var)
    z = (
        F.when((cnt < F.lit(float(min_obs))) | (var <= 0), F.lit(None).cast("double"))
        .otherwise((v - mean) / sd)
    )
    return staged.withColumn(out_col, z).drop("_cx", "_cxx")


def stoch_rsi(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    n: int = 14,
    m: int = 14,
) -> DataFrame:
    """Stochastic RSI (Chande & Kroll): the stochastic oscillator
    applied to the RSI series — ``100·(RSI − min_m RSI)/(max_m RSI −
    min_m RSI)`` — the bounded momentum-of-momentum signal.

    Composes :func:`rsi` (exact-window simple-average variant) and
    quantizes the RSI to integer micro-units BEFORE the m-bar
    min/max/ratio, so the extremes and the final division are exact
    integer operations — bit-identical cross-engine with no double
    min/max subtleties. NULL until the m-bar frame holds m non-NULL
    RSI values; NULL on flat frames (max == min). Both window passes
    share ONE per-key exchange+sort.

    Output: input columns + (rsi_n, stoch_rsi).
    """
    out = rsi(df, keys, ts_col, value_col, n=n, out_col=f"rsi_{n}")
    rq = F.floor(F.col(f"rsi_{n}") * F.lit(1e6) + F.lit(0.5)).cast("long")
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col)).rowsBetween(
        -(m - 1), 0
    )
    out = out.withColumn("_rq", rq)
    lo = F.min("_rq").over(w)
    hi = F.max("_rq").over(w)
    cnt = F.count("_rq").over(w)
    srsi = F.when(
        (cnt == m) & (hi > lo),
        F.lit(100.0) * (F.col("_rq") - lo).cast("double")
        / (hi - lo).cast("double"),
    )
    return out.withColumn("stoch_rsi", srsi).drop("_rq")


def cusum_drift(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    value_col: str,
    k_sigma_halves: int = 1,
    h_sigmas: int = 4,
) -> DataFrame:
    """Two-sided CUSUM changepoint/drift screen — the sequential test a
    monitoring layer runs over per-key series (Page 1954):

        s⁺_t = max(0, s⁺_{t−1} + (x_t − μ − k))
        s⁻_t = max(0, s⁻_{t−1} + (μ − x_t − k))      alarm when s > h

    with slack k = σ/2 and threshold h = 4σ by default.

    STAYS JVM-SIDE: the clamped recurrence has a closed form —
    s_t = c_t − min(0, min_{j≤t} c_j) with c the prefix sum of the
    increments — so both sides are two window passes over ONE per-key
    exchange (cumulative BIGINT sum + running min), no grouped-map fold
    and no recursion anywhere. The SQL oracle is the same two windows.

    Exactness: increments quantize to micro BIGINT before any
    accumulation (integer prefix sums are order-exact); μ and σ come
    from exact decimal whole-series sums (the rolling_zscore recipe)
    and quantize once. Keys with σ = 0 (constant series or n < 2) get
    k = h = 0 and never alarm (a zero-variance series cannot drift).

    Output: keys + order + value + (cusum_pos, cusum_neg, alarm_pos,
    alarm_neg).
    """
    dec = "decimal(38,6)"
    w_all = Window.partitionBy(*keys).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_run = Window.partitionBy(*keys).orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    v = F.col(value_col)
    v6 = F.floor(v * 1e6 + F.lit(0.5)).cast("long")
    n = F.count(v).over(w_all).cast("double")
    sx = F.sum(v.cast(dec)).over(w_all).cast("double")
    sxx = F.sum((v * v).cast(dec)).over(w_all).cast("double")
    var = (n * sxx - sx * sx) / (n * (n - F.lit(1.0)))
    mu6 = F.floor(sx / n * 1e6 + F.lit(0.5)).cast("long")
    sig6 = F.when(
        (n < 2.0) | (var <= 0.0), F.lit(0).cast("long")
    ).otherwise(F.floor(F.sqrt(var) * 1e6 + F.lit(0.5)).cast("long"))
    base = df.select(
        *keys,
        order_col,
        value_col,
        v6.alias("_v6"),
        mu6.alias("_mu6"),
        sig6.alias("_sig6"),
    )
    k6 = (F.col("_sig6") * k_sigma_halves / 2).cast("long")  # sig6 >= 0
    h6 = (F.col("_sig6") * h_sigmas).cast("long")
    dp = F.col("_v6") - F.col("_mu6") - k6
    dn = F.col("_mu6") - F.col("_v6") - k6
    stepped = base.select(
        *keys,
        order_col,
        value_col,
        F.sum(dp).over(w_run).alias("_cp"),
        F.sum(dn).over(w_run).alias("_cn"),
        h6.alias("_h6"),
        F.col("_sig6"),
    )
    sp = F.col("_cp") - F.least(F.lit(0), F.min("_cp").over(w_run))
    sn = F.col("_cn") - F.least(F.lit(0), F.min("_cn").over(w_run))
    return stepped.select(
        *keys,
        order_col,
        value_col,
        (sp / 1e6).alias("cusum_pos"),
        (sn / 1e6).alias("cusum_neg"),
        ((F.col("_sig6") > 0) & (sp > F.col("_h6"))).alias("alarm_pos"),
        ((F.col("_sig6") > 0) & (sn > F.col("_h6"))).alias("alarm_neg"),
    )
