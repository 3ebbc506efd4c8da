"""Crossref JSON work-record parser.

Reimplements (public behavior, original code) the semantics of the
reference's Crossref parser (reference: hepcrawl/parsers/crossref.py:60-356):

- document type via the published Crossref type map
  (crossref.py:24-44; source list https://api.crossref.org/v1/types),
  defaulting to 'article'
- material classification from the title/subtitle prefix
  (Erratum / Addendum / Publisher's Note -> erratum / addendum /
  editorial note, else publication; crossref.py:115-127)
- DOI + material struct (crossref.py:101-108)
- publication_info: artid, journal title (suppressed for book
  chapters), issue, volume, page range split on '-', year from
  ``issued.date-parts``, parent ISBN (crossref.py:129-190)
- authors: 'family, given' name join, raw affiliation names, ORCID id
  pair (crossref.py:192-233)
- licenses: url per license entry, imposing = publisher, material
  rides along (crossref.py:236-266)
- imprint date from ``issued.date-parts`` as a partial ISO date
  (crossref.py:271-284)
- references: one reference dict per entry (journal title / volume /
  issue / first page / year / title / ISBN / DOI / author / raw),
  deduplicated order-preserving by full contents (crossref.py:287-356)

The unit flowing through Ray is a plain dict; parse errors become
error ROWS (never exceptions), matching the engine's error-channel
contract.
"""

from __future__ import annotations

import json
from typing import Any

from hepcrawl_ray.functions.misc import dedupe_list_of_dicts

# Crossref type -> HEP document type (public map, see module docstring)
DOC_TYPE_MAP = {
    "book": "book",
    "book-part": "book chapter",
    "book-section": "book chapter",
    "book-series": "book",
    "book-set": "book",
    "book-track": "book chapter",
    "book-chapter": "book chapter",
    "dissertation": "thesis",
    "edited-book": "book",
    "journal-article": "article",
    "journal-volume": "article",
    "journal": "article",
    "monograph": "book",
    "proceedings": "proceedings",
    "proceedings-article": "conference paper",
    "other": "note",
    "reference-book": "book",
    "report": "report",
    "report-series": "report",
}

_MATERIAL_PREFIXES = (
    ("Erratum", "erratum"),
    ("Addendum", "addendum"),
    ("Publisher's Note", "editorial note"),
)


def _first(value) -> Any:
    """First element of a possibly-missing list field."""
    if isinstance(value, (list, tuple)) and value:
        return value[0]
    return None


def _force_list(value) -> list:
    if value is None:
        return []
    if isinstance(value, (list, tuple)):
        return list(value)
    return [value]


def partial_date(parts) -> str | None:
    """[y] / [y, m] / [y, m, d] -> 'YYYY' / 'YYYY-MM' / 'YYYY-MM-DD'."""
    if not parts:
        return None
    fmt = ("{:04d}", "{:02d}", "{:02d}")
    return "-".join(f.format(int(p)) for f, p in zip(fmt, parts[:3]))


def document_type(message: dict) -> str:
    return DOC_TYPE_MAP.get(message.get("type"), "article")


def material(message: dict) -> str:
    """Erratum/Addendum/Publisher's-Note prefix classification over
    title OR subtitle; default 'publication'."""
    title = _first(message.get("title")) or ""
    subtitle = _first(message.get("subtitle")) or ""
    for prefix, mat in _MATERIAL_PREFIXES:
        if title.startswith(prefix) or subtitle.startswith(prefix):
            return mat
    return "publication"


def _issued_parts(message: dict) -> list:
    issued = message.get("issued") or {}
    return _first(issued.get("date-parts")) or []


def publication_info(message: dict) -> dict:
    pages = message.get("page")
    page_start = pages.split("-")[0] if pages else None
    page_end = pages.split("-")[1] if pages and "-" in pages else None
    doc_type = document_type(message)
    parts = _issued_parts(message)
    return {
        "artid": message.get("article-number"),
        # book chapters cite the parent ISBN, not a journal title
        "journal_title": None if doc_type == "book chapter"
        else _first(message.get("container-title")),
        "journal_issue": message.get("issue"),
        "journal_volume": message.get("volume"),
        "page_start": page_start,
        "page_end": page_end,
        "year": int(parts[0]) if parts else None,
        "material": material(message),
        "parent_isbn": _first(message.get("ISBN")),
    }


def authors(message: dict) -> list[dict]:
    from hepcrawl_ray.jats import normalize_orcid

    out = []
    for a in _force_list(message.get("author")):
        full_name = ", ".join(
            p for p in (a.get("family"), a.get("given")) if p)
        affs = [aff.get("name") for aff in _force_list(a.get("affiliation"))]
        # Crossref ships ORCIDs as http://orcid.org/ URLs; the record
        # stores the canonical dashed form (same rule as the JATS path)
        orcid = normalize_orcid(a.get("ORCID"))
        out.append({
            "full_name": full_name,
            "raw_affiliations": [v for v in affs if v],
            "ids": [{"schema": "ORCID", "value": orcid}] if orcid else [],
        })
    return out


def licenses(message: dict) -> list[dict]:
    mat = material(message)
    publisher = message.get("publisher")
    return [{"imposing": publisher, "material": mat, "url": li.get("URL")}
            for li in _force_list(message.get("license"))]


def _one_reference(ref: dict, source) -> dict:
    """One Crossref reference entry -> flat reference dict (the
    field-by-field shape the reference's ReferenceBuilder assembles)."""
    out: dict[str, Any] = {}
    for src_key, dst_key in (("journal-title", "journal_title"),
                             ("volume", "journal_volume"),
                             ("issue", "journal_issue"),
                             ("first-page", "page_start"),
                             ("year", "year"),
                             ("article-title", "title"),
                             ("ISBN", "isbn"),
                             ("DOI", "doi"),
                             ("author", "author")):
        v = ref.get(src_key)
        if v:
            out[dst_key] = v
    raw = ref.get("unstructured")
    if raw:
        out["raw_ref"] = {"value": raw, "source": source}
    return out


def references(message: dict) -> list[dict]:
    src = message.get("source")
    refs = [_one_reference(r, src)
            for r in _force_list(message.get("reference"))]
    return dedupe_list_of_dicts(refs)


def parse_crossref(record: dict | str, source: str | None = None) -> dict:
    """Crossref API work record (the ``{"message": {...}}`` envelope or
    its JSON string) -> parsed record dict.  Error-row contract: bad
    input returns a record with ``error`` set, never raises."""
    try:
        if isinstance(record, str):
            record = json.loads(record)
        message = record.get("message")
        if not isinstance(message, dict):
            raise ValueError("no message object")
        return {
            "title": _first(message.get("title")),
            "subtitle": _first(message.get("subtitle")),
            "abstract": message.get("abstract"),
            "document_type": document_type(message),
            "material": material(message),
            "dois": [{"doi": message.get("DOI"),
                      "material": material(message)}],
            "publication_info": publication_info(message),
            "imprint_date": partial_date(_issued_parts(message)),
            "authors": authors(message),
            "licenses": licenses(message),
            "references": references(message),
            "source": source or message.get("source"),
            "error": None,
        }
    except (ValueError, AttributeError, TypeError, KeyError) as exc:
        return {"title": None, "subtitle": None, "abstract": None,
                "document_type": None, "material": None, "dois": [],
                "publication_info": {}, "imprint_date": None,
                "authors": [], "licenses": [], "references": [],
                "source": source, "error": f"bad crossref record: {exc}"}
