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


def create_valid_date(raw) -> str | None:
    """Normalize a date string to ISO at its own precision.

    full date -> ``YYYY-MM-DD``; month precision -> ``YYYY-MM``; year
    precision -> ``YYYY``; unparseable -> None
    (reference: hepcrawl/dateutils.py:127-160).
    """
    raw = str(raw).strip()
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
