"""Published-date parsing with reference-strict semantics.

Port target: ``parsePublishedDate`` (reference: src/utils/date.ts:8-48).
Pipeline: trim → strip ``^(published|posted( on)?|on)\\s*`` (ci) → collapse
whitespace → dayjs general parse → today/yesterday (injected clock) → strict
format list → UTC ISO string, honoring the ``utc(hour==0)`` quirk at
date.ts:42: when the parsed local hour is 0 the date is *reinterpreted* with
its wall-clock fields as UTC (keepLocalTime=true); otherwise converted.
Since the engine pins TZ=UTC for determinism, the two branches coincide —
but the quirk is kept explicit for parity and tested.

Raises ``DateParseError`` in strict mode (the reference throws — the crawl
item then fails); the engine's vectorized path maps failures to NULL +
quarantine instead (SURVEY.md §7.3).
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone

_PREFIX_RE = re.compile(r"^(published|posted(\s+on)?|on)\s*", re.IGNORECASE)
_WS_RE = re.compile(r"\s+")

# dayjs general parse accepts ISO-8601 shapes; we model the ones the
# reference's sources ever produce plus the test table (FIXTURES.md §5)
_ISO_RE = re.compile(
    r"^(?P<d>\d{4}-\d{2}-\d{2})"
    r"(?:[T ](?P<t>\d{2}:\d{2}(?::\d{2}(?:\.\d{1,6})?)?)"
    r"(?P<tz>Z|[+-]\d{2}:?\d{2})?)?$"
)

# strict fallback formats (date.ts:31-37); MMMM D and MMMM DD collapse to
# one pattern in Python, as do D/DD MMMM YYYY
_MONTHS = {
    m: i + 1
    for i, m in enumerate(
        "january february march april may june july august september "
        "october november december".split()
    )
}
_MDY_RE = re.compile(r"^([A-Za-z]+) (\d{1,2}), (\d{4})$")
_DMY_RE = re.compile(r"^(\d{1,2}) ([A-Za-z]+) (\d{4})$")
_YMD_RE = re.compile(r"^(\d{4})-(\d{2})-(\d{2})$")


class DateParseError(ValueError):
    pass


def _iso_ms(dt: datetime) -> str:
    """dayjs ``toISOString()``: millisecond precision, trailing Z."""
    dt = dt.astimezone(timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%S.") + f"{dt.microsecond // 1000:03d}Z"


def parse_published_date(
    date_string: str | None, now: datetime | None = None
) -> str:
    """Return the UTC ISO-8601 string the reference would produce.

    ``now`` is the injected clock for today/yesterday (determinism — the
    engine never reads the wall clock; date.ts:25-29 uses dayjs())."""
    if not date_string or not isinstance(date_string, str):
        raise DateParseError(
            f"Invalid date input: expected non-empty string, got "
            f"{type(date_string).__name__}: \"{date_string}\""
        )

    cleaned = _WS_RE.sub(" ", _PREFIX_RE.sub("", date_string.strip()))

    dt = _parse_general(cleaned)

    if dt is None:
        low = cleaned.lower()
        if "today" in low:
            if now is None:
                raise DateParseError("relative date requires injected clock")
            dt = now
        elif "yesterday" in low:
            if now is None:
                raise DateParseError("relative date requires injected clock")
            dt = now - timedelta(days=1)
        else:
            dt = _parse_strict_formats(cleaned)

    if dt is not None:
        # date.ts:42 — parsedDate.utc(parsedDate.hour() === 0)
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)  # keepLocalTime when hour==0;
            # engine runs with TZ=UTC so hour!=0 conversion is identity too
        return _iso_ms(dt)

    raise DateParseError(
        f'Unable to parse date format: "{date_string}". Source format may '
        "have changed and requires code update."
    )


def _parse_general(cleaned: str) -> datetime | None:
    """Approximation of dayjs's permissive constructor for the shapes that
    occur in the reference's sources/tests (ISO date, ISO datetime w/ tz)."""
    m = _ISO_RE.match(cleaned)
    if not m:
        return None
    d = m.group("d")
    t = m.group("t") or "00:00:00"
    if len(t) == 5:
        t += ":00"
    tz = m.group("tz")
    try:
        dt = datetime.fromisoformat(f"{d}T{t}")
    except ValueError:
        return None
    if tz == "Z":
        dt = dt.replace(tzinfo=timezone.utc)
    elif tz:
        sign = 1 if tz[0] == "+" else -1
        hh, mm = int(tz[1:3]), int(tz[-2:])
        dt = dt.replace(tzinfo=timezone(sign * timedelta(hours=hh, minutes=mm)))
    return dt


def _parse_strict_formats(cleaned: str) -> datetime | None:
    m = _MDY_RE.match(cleaned)
    if m:
        mon = _MONTHS.get(m.group(1).lower())
        if mon:
            try:
                return datetime(int(m.group(3)), mon, int(m.group(2)))
            except ValueError:
                return None
    m = _DMY_RE.match(cleaned)
    if m:
        mon = _MONTHS.get(m.group(2).lower())
        if mon:
            try:
                return datetime(int(m.group(3)), mon, int(m.group(1)))
            except ValueError:
                return None
    m = _YMD_RE.match(cleaned)
    if m:
        try:
            return datetime(int(m.group(1)), int(m.group(2)), int(m.group(3)))
        except ValueError:
            return None
    return None


def parse_published_date_or_none(
    date_string: str | None, now: datetime | None = None
) -> str | None:
    """Lenient engine-mode variant: NULL instead of raise (quarantine path)."""
    try:
        return parse_published_date(date_string, now)
    except DateParseError:
        return None


def parse_published_dates_series(raw, now: datetime | None = None):
    """Arrow-batch kernel (pd.Series[str] → pd.Series[str|None]): plain
    ``YYYY-MM-DD`` values — the overwhelming majority of web-corpus dates —
    go through vectorized ``pd.to_datetime`` (validity-checked, e.g.
    2024-02-30 → NULL exactly like the per-row path); everything else falls
    back to the dayjs-parity per-row parser. Output is identical to mapping
    ``parse_published_date_or_none`` row by row (property-tested)."""
    import pandas as pd

    s = raw
    simple = s.str.fullmatch(r"\d{4}-\d{2}-\d{2}", na=False)
    dt = pd.to_datetime(s.where(simple), format="%Y-%m-%d", errors="coerce")
    out = dt.dt.strftime("%Y-%m-%dT%H:%M:%S.000Z").astype(object)
    slow_mask = (~simple) & s.notna()
    if slow_mask.any():
        out[slow_mask] = s[slow_mask].map(
            lambda x: parse_published_date_or_none(x, now)
        )
    return out.where(out.notna(), None)
