"""User extension point (SURVEY.md SS2.9 engine policy): custom
per-instrument computations as Arrow-batched grouped-map pandas
functions.

Everything the reference computes ships as native expressions; this is
the sanctioned escape hatch for user-defined indicators that genuinely
need pandas (exotic TA functions, model scoring). Grouped-map per symbol
is the natural shape: each instrument's history arrives as one ordered
pandas DataFrame, the user returns added columns, Spark parallelizes
across instruments — one shuffle on the group key, Arrow both ways.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import pandas as pd
from pyspark.sql import DataFrame


def apply_per_symbol(
    df: DataFrame,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    output_schema: str,
    keys: Sequence[str] = ("symbol_clean",),
    ts_col: str | None = "timestamp_iso",
) -> DataFrame:
    """Run ``fn`` once per key group as a pandas DataFrame (sorted by
    ``ts_col`` when given — indicator code can assume chronological
    order). ``output_schema`` is the full output schema DDL string.

    Scale: groups are single instruments; even a decade of 5-minute
    candles per symbol is ~750k rows — comfortably one Arrow batch. Skewed
    universes (one instrument dominating) are bounded by per-group size,
    not executor count.
    """

    def wrapped(pdf: pd.DataFrame) -> pd.DataFrame:
        if ts_col is not None:
            pdf = pdf.sort_values(list(keys) + [ts_col])
        return fn(pdf)

    return df.groupBy(*keys).applyInPandas(wrapped, schema=output_schema)


def bollinger_bands(
    window: int = 20, num_std: float = 2.0, price_col: str = "close"
) -> Callable[[pd.DataFrame], pd.DataFrame]:
    """Example user indicator: Bollinger bands as a pandas rolling
    computation (what a user would plug in when they outgrow the native
    sma/rsi window expressions)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        roll = pdf[price_col].rolling(window, min_periods=1)
        mid = roll.mean()
        sd = roll.std().fillna(0.0)
        return pdf.assign(
            bb_mid=mid, bb_upper=mid + num_std * sd, bb_lower=mid - num_std * sd
        )

    return fn
