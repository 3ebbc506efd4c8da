"""hepcrawl-format -> hep-format record normalization.

Reimplements (public behavior, original code, no inspire_schemas
dependency) the reference's format-conversion layer
(reference: hepcrawl/tohep.py:38-357):

- ``normalize_hepcrawl_record``: the wide spider-side item is folded
  into list-shaped hep fields — titles [{title, subtitle, source}],
  abstracts [{value, source}], imprints [{date}], copyright
  [{holder, year, statement, material}], and a publication_info
  entry ONLY when any journal field is present (the
  ``_has_publication_info`` predicate), with journal_year coerced to
  int and every consumed flat key removed (tohep.py:70-148)
- ``get_updated_documents`` / ``hep_to_hep``: the documents patch
  join — files downloaded by the pipeline are matched to record
  documents by URL basename; on a hit the document's url is swapped
  to the stored path, the original kept as old_url, and the basename
  becomes the key; no record_files -> record unchanged
  (tohep.py:38-67, 151-167)
- ``hepcrawl_to_hep``: the builder pass assembling the final record —
  author affiliation filtering, doi/license/collaboration passthrough,
  acquisition_source {method, datetime, source, submission_number},
  number_of_pages from the first page_nr when int-able, the
  collection -> flag/type dispatch (citeable/core/refereed/withdrawn,
  publication types, document types, 'article' default), and the
  first publication_info entry re-shaped (tohep.py:170-357)

These run per record inside ``map_batches`` stages; the unit is a
plain dict and errors surface as error rows upstream.
"""

from __future__ import annotations

import os
from typing import Any

# collection names that map to publication types / document types
# (reference: hepcrawl/tohep.py:277-290)
PUBLICATION_TYPES = ("introductory", "lectures", "review", "manual")
DOCUMENT_TYPES = ("book", "note", "report", "proceedings", "thesis")

_PUBINFO_KEYS = (
    "pubinfo_freetext", "journal_volume", "journal_title", "journal_year",
    "journal_issue", "journal_fpage", "journal_lpage", "journal_artid",
    "journal_doctype",
)


def has_publication_info(item: dict) -> bool:
    """Any journal field present? (reference: tohep.py:70-79)."""
    return any(item.get(k) for k in _PUBINFO_KEYS)


def normalize_hepcrawl_record(item: dict, source: str) -> dict:
    """Wide hepcrawl item -> hep list-shaped fields
    (reference: tohep.py:89-148).  Mutates and returns ``item``."""
    if "related_article_doi" in item:
        item["dois"] = item.get("dois", []) + \
            item.pop("related_article_doi", [])

    item["titles"] = [{
        "title": item.pop("title", ""),
        "subtitle": item.pop("subtitle", ""),
        "source": item.pop("source", source),
    }]
    item["abstracts"] = [{
        "value": item.pop("abstract", ""),
        "source": source,
    }]
    item["imprints"] = [{
        "date": item.pop("date_published", ""),
    }]
    item["copyright"] = [{
        "holder": item.pop("copyright_holder", ""),
        "year": item.pop("copyright_year", ""),
        "statement": item.pop("copyright_statement", ""),
        "material": item.pop("copyright_material", ""),
    }]

    if has_publication_info(item):
        item["publication_info"] = [{
            "journal_title": item.pop("journal_title", ""),
            "journal_volume": item.pop("journal_volume", ""),
            "journal_issue": item.pop("journal_issue", ""),
            "artid": item.pop("journal_artid", ""),
            "page_start": item.pop("journal_fpage", ""),
            "page_end": item.pop("journal_lpage", ""),
            "note": item.pop("journal_doctype", ""),
            "pubinfo_freetext": item.pop("pubinfo_freetext", ""),
            "pubinfo_material": item.pop("pubinfo_material", ""),
        }]
        if item.get("journal_year"):
            item["publication_info"][0]["year"] = int(
                item.pop("journal_year"))

    for key in _PUBINFO_KEYS:
        item.pop(key, None)
    return item


def get_updated_documents(current_documents: list[dict],
                          record_files: list[dict]) -> list[dict]:
    """Patch document urls with downloaded file paths, joined on URL
    basename (reference: tohep.py:38-67).  ``record_files`` entries
    are ``{"name": ..., "path": ...}`` (the RecordFile shape)."""
    index = {os.path.basename(rf["name"]): rf["path"]
             for rf in record_files}
    new_documents = []
    for document in current_documents:
        url = document.get("old_url", document.get("url", ""))
        base = os.path.basename(url)
        if url and base in index:
            document["old_url"] = document["url"]
            document["url"] = index[base]
            if "key" not in document:
                document["key"] = base
        elif url:
            document["url"] = document["old_url"]
        new_documents.append(document)
    return new_documents


def hep_to_hep(hep_record: dict, record_files: list[dict]) -> dict:
    """hep-format passthrough with the documents patch
    (reference: tohep.py:151-167)."""
    if record_files:
        hep_record["documents"] = get_updated_documents(
            hep_record["documents"], record_files)
    return hep_record


def _filter_affiliations(affiliations) -> list[str]:
    return [a.get("value") for a in (affiliations or []) if a.get("value")]


def hepcrawl_to_hep(crawler_record: dict) -> dict:
    """Normalized hepcrawl record -> final hep record
    (reference: tohep.py:170-357).  Empty/absent fields are omitted
    from the output, matching the builder's behavior."""
    rec: dict[str, Any] = {}
    source = crawler_record["acquisition_source"]["source"]

    authors = [{
        "full_name": a["full_name"],
        "raw_affiliations": _filter_affiliations(a.get("affiliations")),
    } for a in crawler_record.get("authors", [])]
    if authors:
        rec["authors"] = authors

    titles = [{"title": t.get("title"), "subtitle": t.get("subtitle"),
               "source": t.get("source")}
              for t in crawler_record.get("titles", []) if t.get("title")]
    if titles:
        rec["titles"] = titles

    abstracts = [{"value": a.get("value"), "source": a.get("source")}
                 for a in crawler_record.get("abstracts", [])
                 if a.get("value")]
    if abstracts:
        rec["abstracts"] = abstracts

    eprints = [{"value": e.get("value"), "categories": e.get("categories")}
               for e in crawler_record.get("arxiv_eprints", [])]
    if eprints:
        rec["arxiv_eprints"] = eprints

    dois = [{"value": d.get("value"), "material": d.get("material")}
            for d in crawler_record.get("dois", []) if d.get("value")]
    if dois:
        rec["dois"] = dois

    if crawler_record.get("private_notes"):
        rec["_private_notes"] = list(crawler_record["private_notes"])
    public_notes = [{"value": n.get("value"), "source": n.get("source")}
                    for n in crawler_record.get("public_notes", [])]
    if public_notes:
        rec["public_notes"] = public_notes

    licenses = [{"url": li.get("url"), "license": li.get("license"),
                 "material": li.get("material")}
                for li in crawler_record.get("license", [])]
    if licenses:
        rec["license"] = licenses

    collaborations = [{"value": c.get("value")}
                      for c in crawler_record.get("collaborations", [])
                      if c.get("value")]
    if collaborations:
        rec["collaborations"] = collaborations

    imprints = [{"date": i.get("date")}
                for i in crawler_record.get("imprints", []) if i.get("date")]
    if imprints:
        rec["imprints"] = imprints

    copyrights = [{"holder": c.get("holder"), "material": c.get("material"),
                   "statement": c.get("statement")}
                  for c in crawler_record.get("copyright", [])
                  if any((c.get("holder"), c.get("material"),
                          c.get("statement")))]
    if copyrights:
        rec["copyright"] = copyrights

    if crawler_record.get("preprint_date"):
        rec["preprint_date"] = crawler_record["preprint_date"]

    # envelope fields (reference: items.py:117-128 free_keywords,
    # items.py:271-283 thesis struct, items.py:294-311
    # external_system_numbers; builder analogs add_keyword/add_thesis)
    keywords = [{"value": k, "source": source}
                for k in crawler_record.get("free_keywords", []) if k]
    if keywords:
        rec["keywords"] = keywords

    ext = [{"institute": e.get("institute"), "value": e.get("value")}
           for e in crawler_record.get("external_system_numbers", [])
           if e.get("value")]
    if ext:
        rec["external_system_numbers"] = ext

    thesis = crawler_record.get("thesis")
    if thesis:
        t = thesis[0] if isinstance(thesis, list) else thesis
        info = {k: v for k, v in (
            ("date", t.get("date")),
            ("defense_date", t.get("defense_date")),
            ("degree_type", t.get("degree_type")),
        ) if v}
        insts = [{"name": n} for n in t.get("institutions", []) if n]
        if insts:
            info["institutions"] = insts
        if info:
            rec["thesis_info"] = info

    acq = crawler_record.get("acquisition_source", {})
    rec["acquisition_source"] = {
        "method": acq["method"],
        "datetime": acq["datetime"],
        "source": source,
        "submission_number": acq["submission_number"],
    }

    try:
        rec["number_of_pages"] = int(crawler_record.get("page_nr", [])[0])
    except (TypeError, ValueError, IndexError):
        pass

    document_types: list[str] = []
    publication_types: list[str] = []
    for collection in crawler_record.get("collections", []):
        name = collection["primary"].strip().lower()
        if name == "arxiv":
            continue
        elif name == "citeable":
            rec["citeable"] = True
        elif name == "core":
            rec["core"] = True
        elif name == "noncore":
            rec["core"] = False
        elif name == "published":
            rec["refereed"] = True
        elif name == "withdrawn":
            rec["withdrawn"] = True
        elif name in PUBLICATION_TYPES:
            publication_types.append(name)
        elif name == "bookchapter":
            document_types.append("book chapter")
        elif name == "conferencepaper":
            document_types.append("conference paper")
        elif name in DOCUMENT_TYPES:
            document_types.append(name)
    if publication_types:
        rec["publication_types"] = publication_types
    rec["document_type"] = document_types or ["article"]

    pub = crawler_record.get("publication_info", [{}])[0]
    pub_out = {k: v for k, v in (
        ("year", pub.get("year")),
        ("artid", pub.get("artid")),
        ("page_end", pub.get("page_end")),
        ("page_start", pub.get("page_start")),
        ("journal_issue", pub.get("journal_issue")),
        ("journal_title", pub.get("journal_title")),
        ("journal_volume", pub.get("journal_volume")),
        ("pubinfo_freetext", pub.get("pubinfo_freetext")),
        ("material", pub.get("pubinfo_material")),
    ) if v}
    if pub_out:
        rec["publication_info"] = [pub_out]

    report_numbers = [{"value": r.get("value"), "source": r.get("source")}
                      for r in crawler_record.get("report_numbers", [])]
    if report_numbers:
        rec["report_numbers"] = report_numbers

    urls = [{"value": u.get("value")}
            for u in crawler_record.get("urls", []) if u.get("value")]
    if urls:
        rec["urls"] = urls

    documents = [{
        "description": d.get("description"), "fulltext": d.get("fulltext"),
        "hidden": d.get("hidden"), "key": d["key"],
        "material": d.get("material"), "original_url": d.get("original_url"),
        "url": d["url"],
    } for d in crawler_record.get("documents", [])]
    if documents:
        rec["documents"] = documents

    return rec


# ---------------------------------------------------------------------------
# lightweight hep-record validation (the LiteratureBuilder.validate
# boundary — reference: hepcrawl/tohep.py:170-357 delegates to
# inspire_schemas; here: required-fields / type / enum checks with no
# schema dependency, emitting error STRINGS so callers produce error
# ROWS, never exceptions)
# ---------------------------------------------------------------------------

import re as _re

# document_type enum of the hep literature schema (the values the
# builder dispatch above can emit, plus the schema's remaining members)
VALID_DOCUMENT_TYPES = frozenset({
    "article", "activity report", "book", "book chapter",
    "conference paper", "note", "proceedings", "report", "thesis",
})

_DOI_RE = _re.compile(r"^10\.\d+(\.\d+)*/.+$")
_ISO_DATE_RE = _re.compile(r"^(\d{4})(?:-(\d{2})(?:-(\d{2}))?)?$")


def _valid_iso_partial(value) -> bool:
    """ISO date at year/month/day precision with real calendar bounds."""
    if not isinstance(value, str):
        return False
    m = _ISO_DATE_RE.match(value)
    if not m:
        return False
    y, mo, d = m.group(1), m.group(2), m.group(3)
    if mo is None:
        return True
    if not 1 <= int(mo) <= 12:
        return False
    if d is None:
        return True
    from datetime import datetime

    try:
        datetime(int(y), int(mo), int(d))
        return True
    except ValueError:
        return False


def validate_hep_record(rec: dict) -> list[str]:
    """Validate an assembled hep record; returns error strings (empty
    list == valid).

    Mirrors the required/type/enum surface the reference enforces via
    ``LiteratureBuilder.validate()`` without the inspire_schemas
    dependency: required titles / document_type / acquisition_source,
    DOI syntax, ISO imprint dates, positive page counts, non-empty
    author names, sane publication years.  Check ORDER is part of the
    contract (the oracled query pins first_error).
    """
    errors: list[str] = []

    titles = rec.get("titles") or []
    if not titles:
        errors.append("titles: required and non-empty")
    else:
        for i, t in enumerate(titles):
            v = t.get("title")
            if not (isinstance(v, str) and v.strip()):
                errors.append(f"titles[{i}].title: empty")

    doc_types = rec.get("document_type") or []
    if not doc_types:
        errors.append("document_type: required and non-empty")
    for i, dt in enumerate(doc_types):
        if dt not in VALID_DOCUMENT_TYPES:
            errors.append(f"document_type[{i}]: unknown value {dt!r}")

    acq = rec.get("acquisition_source")
    if not isinstance(acq, dict):
        errors.append("acquisition_source: required")
    else:
        for k in ("method", "datetime", "source", "submission_number"):
            if not acq.get(k):
                errors.append(f"acquisition_source.{k}: required")

    for i, d in enumerate(rec.get("dois") or []):
        v = d.get("value")
        if not (isinstance(v, str) and _DOI_RE.match(v)):
            errors.append(f"dois[{i}].value: not a DOI: {v!r}")

    for i, im in enumerate(rec.get("imprints") or []):
        if not _valid_iso_partial(im.get("date")):
            errors.append(
                f"imprints[{i}].date: not an ISO date: {im.get('date')!r}")

    pages = rec.get("number_of_pages")
    if pages is not None and (not isinstance(pages, int)
                              or isinstance(pages, bool) or pages <= 0):
        errors.append(f"number_of_pages: not a positive int: {pages!r}")

    for i, a in enumerate(rec.get("authors") or []):
        v = a.get("full_name")
        if not (isinstance(v, str) and v.strip()):
            errors.append(f"authors[{i}].full_name: empty")

    for i, p in enumerate(rec.get("publication_info") or []):
        y = p.get("year")
        if y is not None and (not isinstance(y, int)
                              or isinstance(y, bool)
                              or not 1000 <= y <= 2100):
            errors.append(
                f"publication_info[{i}].year: out of range: {y!r}")

    return errors
