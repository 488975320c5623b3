"""Period / interval token parsing (SURVEY.md F12, P7).

The reference approximates months as 30 days and years as 365 days
(api/api_handler.py:746-769) and parses intervals '5m'/'1h'/'1d' to
minutes with 1d = 1440 (api/api_handler.py:772-785). We reproduce those
semantics exactly for parity — deliberately NOT ``add_months`` — down to
the edge cases: a bare unit token ('d'/'m'/'y') is value 0, a malformed
period falls back to 30 days, and a malformed interval RAISES ValueError
(the reference has no fallback there; pass ``default=`` to opt into one).
"""

from __future__ import annotations

from datetime import timedelta

#: Default lookback when a period token fails to parse
#: (api/api_handler.py:767-769 falls back to 30 days).
DEFAULT_PERIOD = timedelta(days=30)


def period_to_timedelta(period: str) -> timedelta:
    """'3m' -> 90 days, '30d' -> 30 days, '2y' -> 730 days; a bare number
    ('45') is days, a bare unit ('d') is 0 days, anything unparseable is
    the 30-day default (api/api_handler.py:745-768 behavior)."""
    token = (period or "").lower().strip()
    try:
        unit = token[-1]
        value = int(token[:-1]) if len(token) > 1 else 0
        if unit == "d":
            days = value
        elif unit == "m":
            days = value * 30
        elif unit == "y":
            days = value * 365
        else:
            days = int(token)
        return timedelta(days=days)
    except (ValueError, IndexError, OverflowError):
        return DEFAULT_PERIOD


def interval_to_minutes(interval: str, default: int | None = None) -> int:
    """'5m' -> 5, '1h' -> 60, '1d' -> 1440; a bare number ('15') is
    minutes. Malformed tokens raise ValueError exactly like the
    reference's parse_interval_to_minutes (api/api_handler.py:772-785);
    pass ``default=`` for a non-raising variant."""
    token = (interval or "").lower().strip()
    try:
        if token.endswith("m"):
            return int(token[:-1])
        if token.endswith("h"):
            return int(token[:-1]) * 60
        if token.endswith("d"):
            return int(token[:-1]) * 1440
        return int(token)
    except ValueError:
        if default is not None:
            return default
        raise
