"""List/lookup/range helpers (semantics of hepcrawl/utils.py:150-335)."""

from __future__ import annotations

import re


def get_first(iterable, default=None):
    """First truthy element, else default (reference: hepcrawl/utils.py:150-169)."""
    for v in iterable:
        if v:
            return v
    return default


def build_dict(seq, key):
    """Index a list of dicts by ``key`` for O(1) lookups; each value also
    carries its original position as ``index``
    (reference: hepcrawl/utils.py:210-217)."""
    return {d[key]: {**d, "index": i} for i, d in enumerate(seq)}


def has_numbers(text: str) -> bool:
    """True if any character is a digit (reference: hepcrawl/utils.py:226-228)."""
    return any(ch.isdigit() for ch in text)


def range_as_string(data) -> str:
    """Group consecutive integers into ranges:
    ``["1981","1982","1985"]`` -> ``"1981-1982, 1985"``
    (reference: hepcrawl/utils.py:232-248)."""
    values = [int(v) for v in data]
    if not values:
        return ""
    out = []
    run_start = prev = values[0]
    for v in values[1:] + [None]:
        if v is not None and v == prev + 1:
            prev = v
            continue
        out.append(str(run_start) if run_start == prev
                   else f"{run_start}-{prev}")
        if v is not None:
            run_start = prev = v
    return ", ".join(out)


def get_journal_and_section(publication: str) -> tuple[str, str]:
    """Split a trailing section letter A-E off a journal title and drop
    the word "Section" (reference: hepcrawl/utils.py:285-304)."""
    pieces = [p for p in re.split(r"(\W+)", publication) if p]
    if not pieces:
        return "", ""
    section = ""
    if pieces[-1] in ("A", "B", "C", "D", "E"):
        section = pieces.pop()
    title = "".join(p for p in pieces if "section" not in p.lower()).strip(", ")
    return title, section


def get_licenses(license_url=None, license_text=None, license_material=None) -> list[dict]:
    """License struct list from url/text/material
    (reference: hepcrawl/utils.py:307-335)."""
    if license_url or license_text:
        return [{"license": license_text, "url": license_url,
                 "material": license_material}]
    return []


def dedupe_list(items) -> list:
    """Order-preserving exact dedup (reference usage:
    hepcrawl/parsers/arxiv.py:127,374)."""
    seen = set()
    out = []
    for it in items:
        if it not in seen:
            seen.add(it)
            out.append(it)
    return out


def dedupe_list_of_dicts(items) -> list[dict]:
    """Order-preserving dedup of dicts by full contents (reference usage:
    hepcrawl/parsers/crossref.py:301)."""
    seen = set()
    out = []
    for d in items:
        key = tuple(sorted((k, repr(v)) for k, v in d.items()))
        if key not in seen:
            seen.add(key)
            out.append(d)
    return out
