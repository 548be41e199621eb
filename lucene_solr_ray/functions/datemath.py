"""Solr date math (solr/core/src/java/org/apache/solr/util/
DateMathParser.java): `<base></UNIT | +N UNIT | -N UNIT>*` where base is an
ISO-8601 instant or `NOW`.

  2024-03-05T10:30:00Z/DAY+6MONTHS-3DAYS
  NOW/HOUR+30MINUTES

Semantics replicated from the reference:
- `/UNIT` rounds DOWN to the unit start (YEAR, MONTH, DAY/DATE, HOUR,
  MINUTE, SECOND);
- `+`/`-` add calendar units; MONTH/YEAR arithmetic clamps the
  day-of-month exactly like java.util.Calendar.add (Jan 31 + 1MONTH →
  Feb 29 in a leap year) — DuckDB's INTERVAL month arithmetic clamps the
  same way, which is what the gate's SQL twin leans on;
- units accept the reference's aliases (DAYS/DATE, MILLIS/MILLISECONDS,
  …); unknown units or trailing garbage raise ValueError (the parser
  throws ParseException).

Everything is timezone-naive UTC (`Z` accepted and stripped), microsecond
precision — the engine's timestamp columns are `timestamp[us]`.
"""

from __future__ import annotations

import calendar
import re
from datetime import datetime, timedelta, timezone

__all__ = ["parse_date_math"]

_OP_RE = re.compile(r"(/([A-Z]+))|([+\-])(\d+)([A-Z]+)")

# canonical unit ← aliases (DateMathParser.CALENDAR_UNITS)
_UNITS = {
    "YEAR": "YEAR", "YEARS": "YEAR",
    "MONTH": "MONTH", "MONTHS": "MONTH",
    "DAY": "DAY", "DAYS": "DAY", "DATE": "DAY",
    "HOUR": "HOUR", "HOURS": "HOUR",
    "MINUTE": "MINUTE", "MINUTES": "MINUTE", "MIN": "MINUTE", "MINS": "MINUTE",
    "SECOND": "SECOND", "SECONDS": "SECOND", "SEC": "SECOND", "SECS": "SECOND",
    "MILLI": "MILLI", "MILLIS": "MILLI", "MILLISECOND": "MILLI", "MILLISECONDS": "MILLI",
}


def _round_down(dt: datetime, unit: str) -> datetime:
    if unit == "YEAR":
        return dt.replace(month=1, day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "MONTH":
        return dt.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "DAY":
        return dt.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit == "HOUR":
        return dt.replace(minute=0, second=0, microsecond=0)
    if unit == "MINUTE":
        return dt.replace(second=0, microsecond=0)
    if unit == "SECOND":
        return dt.replace(microsecond=0)
    if unit == "MILLI":
        return dt.replace(microsecond=dt.microsecond // 1000 * 1000)
    raise ValueError(f"cannot round to unit {unit}")


def _add(dt: datetime, n: int, unit: str) -> datetime:
    if unit == "YEAR":
        return _add(dt, 12 * n, "MONTH")
    if unit == "MONTH":
        m = dt.month - 1 + n
        year = dt.year + m // 12
        month = m % 12 + 1
        day = min(dt.day, calendar.monthrange(year, month)[1])  # Calendar.add clamp
        return dt.replace(year=year, month=month, day=day)
    span = {
        "DAY": timedelta(days=n),
        "HOUR": timedelta(hours=n),
        "MINUTE": timedelta(minutes=n),
        "SECOND": timedelta(seconds=n),
        "MILLI": timedelta(milliseconds=n),
    }.get(unit)
    if span is None:
        raise ValueError(f"unknown unit {unit}")
    return dt + span


def parse_date_math(expr: str, now: str | datetime | None = None) -> datetime:
    """Evaluate a Solr date-math expression → naive-UTC datetime."""
    expr = expr.strip()
    if expr.startswith("NOW"):
        if now is None:
            base = datetime.now(timezone.utc).replace(tzinfo=None)
        elif isinstance(now, datetime):
            base = now
        else:
            base = datetime.fromisoformat(now.replace("Z", ""))
        rest = expr[3:]
    else:
        m = re.match(r"^(\d{4}-\d{2}-\d{2}(?:T\d{2}:\d{2}:\d{2}(?:\.\d+)?)?)Z?", expr)
        if not m:
            raise ValueError(f"date math: bad base instant in {expr!r}")
        base = datetime.fromisoformat(m.group(1))
        rest = expr[m.end() :]
    dt = base
    pos = 0
    while pos < len(rest):
        m = _OP_RE.match(rest, pos)
        if m is None:
            raise ValueError(f"date math: unparsable op at {rest[pos:]!r} in {expr!r}")
        if m.group(2) is not None:  # /UNIT
            unit = _UNITS.get(m.group(2))
            if unit is None:
                raise ValueError(f"date math: unknown unit {m.group(2)!r}")
            dt = _round_down(dt, unit)
        else:
            unit = _UNITS.get(m.group(5))
            if unit is None:
                raise ValueError(f"date math: unknown unit {m.group(5)!r}")
            n = int(m.group(4)) * (1 if m.group(3) == "+" else -1)
            dt = _add(dt, n, unit)
        pos = m.end()
    return dt
