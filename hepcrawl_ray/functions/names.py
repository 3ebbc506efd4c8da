"""Author-name functions (semantics of hepcrawl/utils.py:172-282)."""

from __future__ import annotations

import re

_INITIALS_GAP = re.compile(r"([A-Z]\.)[\s\-]+(?=[A-Z]\.)")
_FOR_THE = re.compile(r"\bfor\s+the\b", flags=re.I)
_INST_HINTS = ("institute", "university")  # looks institutional, not a collab


def collapse_initials(name: str) -> str:
    """``"T. A."`` -> ``"T.A."`` (reference: hepcrawl/utils.py:172-176)."""
    if name.count(".") > 1:
        name = _INITIALS_GAP.sub(r"\1", name)
    return name


def split_fullname(author: str, switch_name_order: bool = False) -> tuple[str, str]:
    """Split a name into (surname, given_names).

    Comma-separated names put the surname first; otherwise the last
    token is the surname (multi-part surnames are not detected — same
    documented limitation as the reference,
    reference: hepcrawl/utils.py:179-207).
    """
    if not author:
        return "", ""
    if "," in author:
        parts = [p.strip() for p in author.split(",")]
        surname_first = not switch_name_order
    else:
        parts = author.split()
        surname_first = switch_name_order
    if surname_first:
        return parts[0], " ".join(parts[1:])
    return parts[-1], " ".join(parts[:-1])


def coll_cleanforthe(coll: str) -> tuple[str, str | None]:
    """Split "X for the Y Collaboration" into (collaboration, author)
    (reference: hepcrawl/utils.py:260-282).

    Returns the input untouched when it looks institutional rather than
    like a collaboration.
    """
    author = None
    low = coll.lower()
    if any(h in low for h in _INST_HINTS):
        return coll, author
    coll = coll.strip(".; ")
    if _FOR_THE.search(coll):
        lead, trail = _FOR_THE.split(coll, maxsplit=1)
        if re.search(r"\w", lead):
            author = lead.strip()
        if re.search(r"\w", trail):
            coll = trail
    coll = re.sub(r"(?i)^ *the ", "", coll)
    coll = re.sub(r"(?i) *collaborations? *", "", coll)
    return coll.strip(), author


def parse_author_str(raw: str) -> dict:
    """Author string -> struct with full_name/surname/given_names/affiliations.

    Accepts ``"G. I. Surname (Aff1; Aff2)"`` — the caption grammar's
    author form.  Mirrors ``parse_authors`` completion semantics
    (reference: hepcrawl/inputs.py:46-66): initials collapsed, full name
    is ``"Surname, Given"``.
    """
    raw = raw.strip()
    affs = []
    m = re.search(r"\(([^)]*)\)\s*$", raw)
    if m:
        affs = [{"value": a.strip()} for a in m.group(1).split(";") if a.strip()]
        raw = raw[:m.start()].strip()
    surname, given = split_fullname(raw)
    given = collapse_initials(given)
    full = f"{surname}, {given}" if given else surname
    return {"full_name": full, "given_names": given, "surname": surname,
            "affiliations": affs}
