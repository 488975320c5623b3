from .rollup import (  # noqa: F401
    series_rollup,
    daily_rollup,
    symbol_stats,
    dispersion_stats,
    latest_snapshot,
    conditional_counts,
)
from .resample import resample_candles, resample_series  # noqa: F401
from .dedup import dedup_by_key  # noqa: F401
from .windows import sma, rsi, daily_window_summary  # noqa: F401
from .topk import top_k, tail_limit, top_movers  # noqa: F401
from .joins import enrich, asof_join  # noqa: F401
