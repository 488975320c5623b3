"""Sorts / limits / top-k (SURVEY.md SS2.6, O1-O9).

``orderBy(...).limit(k)`` compiles to TakeOrderedAndProject — a per-
partition top-k followed by a k-row merge on the driver. No global sort is
materialized, so these stay cheap at any scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.candles import price_change_cols


def top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """O2/O3 — ORDER BY ... LIMIT k."""
    return df.orderBy(*order).limit(k)


def tail_limit(df: DataFrame, ts_col: str, n: int, tiebreak: str | None = None) -> DataFrame:
    """O5 — most recent N rows, returned ascending (the reference's
    ``candles[-limit:]`` after an asc sort, api/api_handler.py:437-443).
    Implemented as desc top-k then re-sort — never a full global sort."""
    desc = [F.col(ts_col).desc()] + ([F.col(tiebreak).desc()] if tiebreak else [])
    asc = [F.col(ts_col).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    return df.orderBy(*desc).limit(n).orderBy(*asc)


def top_movers(
    daily: DataFrame,
    pct_col: str = "price_change_percent",
    limit: int = 10,
) -> tuple[DataFrame, DataFrame]:
    """O4 — (gainers, losers): two ordered limits over ONE daily-summary
    DataFrame (cache it upstream exactly as the reference reuses its
    daily_summary result, analytics/lambda_analytics.py:393-403)."""
    gainers = daily.orderBy(F.col(pct_col).desc()).limit(limit)
    losers = daily.orderBy(F.col(pct_col).asc()).limit(limit)
    return gainers, losers


def daily_summary_with_movers(
    daily_rollup_df: DataFrame,
    open_col: str = "open",
    close_col: str = "close",
    high_col: str = "high",
    low_col: str = "low",
) -> DataFrame:
    """Attach F8 derived columns to a daily rollup — the shared input of
    O4/O7/O8 rankings."""
    return price_change_cols(daily_rollup_df, open_col, close_col, high_col, low_col)
