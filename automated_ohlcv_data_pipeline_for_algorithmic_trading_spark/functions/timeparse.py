"""Period / interval token parsing (SURVEY.md F12, P7).

The reference approximates months as 30 days and years as 365 days
(api/api_handler.py:746-769) and parses intervals '5m'/'1h'/'1d' to
minutes with 1d = 1440 (api/api_handler.py:772-785). We reproduce those
semantics exactly for parity — deliberately NOT ``add_months``.
"""

from __future__ import annotations

import re
from datetime import timedelta

_PERIOD_RE = re.compile(r"^(\d+)([dmy])$", re.IGNORECASE)
_INTERVAL_RE = re.compile(r"^(\d+)([mhd])$", re.IGNORECASE)

#: Default lookback when a period token fails to parse
#: (api/api_handler.py:767-769 falls back to 30 days).
DEFAULT_PERIOD = timedelta(days=30)


def period_to_timedelta(period: str) -> timedelta:
    """'3m' -> 90 days, '30d' -> 30 days, '2y' -> 730 days; a bare number
    ('45') is days (api/api_handler.py:763-764 ``days = int(token)``)."""
    token = (period or "").strip()
    m = _PERIOD_RE.match(token)
    if not m:
        if token.isdigit():
            return timedelta(days=int(token))
        return DEFAULT_PERIOD
    n, unit = int(m.group(1)), m.group(2).lower()
    days = {"d": 1, "m": 30, "y": 365}[unit]
    return timedelta(days=n * days)


def interval_to_minutes(interval: str, default: int = 5) -> int:
    """'5m' -> 5, '1h' -> 60, '1d' -> 1440; a bare number ('15') is
    minutes (api/api_handler.py:784-785 fallback)."""
    token = (interval or "").strip()
    m = _INTERVAL_RE.match(token)
    if not m:
        if token.isdigit():
            return int(token)
        return default
    n, unit = int(m.group(1)), m.group(2).lower()
    return n * {"m": 1, "h": 60, "d": 1440}[unit]
