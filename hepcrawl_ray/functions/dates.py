"""Date normalization (semantics of hepcrawl/dateutils.py:23-206).

The reference ships a pre-1900 strftime workaround because Python 2's
``time.strftime`` rejected years < 1900; Python 3 formats them
natively, so the same *behavior* (multi-format parse -> zero-padded
ISO, partial dates preserved at their precision) needs no cycle trick
here.  Format fallback chain mirrors DATE_FORMATS_FULL/MONTH/YEAR
(reference: hepcrawl/dateutils.py:23-31).
"""

from __future__ import annotations

from datetime import datetime

_FULL_FORMATS = (
    "%Y-%m-%d", "%d %m %Y", "%d %b %Y", "%d %B %Y", "%d %b %y", "%d %B %y",
    "%Y-%m-%dT%H:%M:%SZ", "%d-%m-%Y",
)
_MONTH_FORMATS = (
    "%Y-%m", "%Y %b", "%b %Y", "%Y %B", "%B %Y",
    "%y-%m", "%y %b", "%b %y", "%y %B", "%B %y",
)
_YEAR_FORMATS = ("%Y",)


import re as _re

_MONTH_NAMES: dict[str, int] = {}
for _i, _n in enumerate(("January February March April May June July August "
                         "September October November December").split(), 1):
    _MONTH_NAMES[_n] = _i
    _MONTH_NAMES[_n[:3]] = _i

_ISO_FULL = _re.compile(r"^(\d{4})-(\d{2})-(\d{2})$")
_ISO_MONTH = _re.compile(r"^(\d{4})-(\d{2})$")
_YEAR_ONLY = _re.compile(r"^\d{4}$")
_DAY_NAME_YEAR = _re.compile(r"^(\d{1,2}) ([A-Za-z]+) (\d{4})$")
_NAME_YEAR = _re.compile(r"^([A-Za-z]+) (\d{4})$")


def _valid_ymd(y: int, m: int, d: int) -> bool:
    try:
        datetime(y, m, d)
        return True
    except ValueError:
        return False


def create_valid_date(raw) -> str | None:
    """Normalize a date string to ISO at its own precision.

    full date -> ``YYYY-MM-DD``; month precision -> ``YYYY-MM``; year
    precision -> ``YYYY``; unparseable -> None
    (reference: hepcrawl/dateutils.py:127-160).

    Common shapes are dispatched directly (strptime costs ~35us per
    *failed* format try, and the fallback chain tries up to 19); the
    chain remains for everything else.
    """
    raw = str(raw).strip()
    m = _ISO_FULL.match(raw)
    if m:
        y, mo, d = (int(g) for g in m.groups())
        return f"{y:04d}-{mo:02d}-{d:02d}" if _valid_ymd(y, mo, d) else None
    m = _DAY_NAME_YEAR.match(raw)
    if m:
        mo = _MONTH_NAMES.get(m.group(2))
        if mo is not None:
            y, d = int(m.group(3)), int(m.group(1))
            if _valid_ymd(y, mo, d):
                return f"{y:04d}-{mo:02d}-{d:02d}"
        return _slow_parse(raw)
    m = _NAME_YEAR.match(raw)
    if m:
        mo = _MONTH_NAMES.get(m.group(1))
        if mo is not None:
            return f"{int(m.group(2)):04d}-{mo:02d}"
        return _slow_parse(raw)
    m = _ISO_MONTH.match(raw)
    if m:
        y, mo = int(m.group(1)), int(m.group(2))
        return f"{y:04d}-{mo:02d}" if 1 <= mo <= 12 else _slow_parse(raw)
    if _YEAR_ONLY.match(raw):
        return raw
    return _slow_parse(raw)


def _slow_parse(raw: str) -> str | None:
    for fmts, out in ((_FULL_FORMATS, "%Y-%m-%d"),
                      (_MONTH_FORMATS, "%Y-%m"),
                      (_YEAR_FORMATS, "%Y")):
        for fmt in fmts:
            try:
                return datetime.strptime(raw, fmt).strftime(out)
            except ValueError:
                continue
    return None


def parse_date(raw) -> str | None:
    """Alias with the reference's ``parse_date`` role (normalize-or-None)."""
    return create_valid_date(raw)


def format_year(raw) -> int | None:
    """Year of a date string, 0/None for unparseable
    (reference: hepcrawl/dateutils.py:189-206 returns 0 on failure)."""
    iso = create_valid_date(raw)
    return int(iso[:4]) if iso else 0
