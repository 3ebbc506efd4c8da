"""Caption parser: caption string -> hep-record-analog struct.

The per-record parse stage of the engine — the role the reference's
format parsers play (``ArxivParser.parse`` reference:
hepcrawl/parsers/arxiv.py:99-403, loader processors reference:
hepcrawl/loaders.py:47-204), over the synthetic caption grammar
defined in ``synth.py``:

1. strip presentation tags (<i>/<b>) keeping content
   (reference: hepcrawl/inputs.py:39-43)
2. HTML sub/sup -> LaTeX (reference: hepcrawl/inputs.py:31-36)
3. collapse whitespace (reference: hepcrawl/inputs.py:106-113)
4. section split (Authors/DOI/Published/Type), author struct
   completion with initials collapsing
   (reference: hepcrawl/inputs.py:46-66) and "for the X Collaboration"
   extraction (reference: hepcrawl/utils.py:260-282)
5. multi-format date -> ISO at its precision
   (reference: hepcrawl/dateutils.py:127-160)
6. doctype keyword classification
   (reference: hepcrawl/parsers/arxiv.py:376-386)

Malformed captions yield an *error row*, never an exception
(reference: hepcrawl/utils.py:492-502 error ParsedItem).
"""

from __future__ import annotations

import re

from hepcrawl_ray.functions import (
    clean_whitespace_characters,
    coll_cleanforthe,
    convert_html_subscripts_to_latex,
    create_valid_date,
    parse_author_str,
    remove_tags,
)

MALFORMED_MSG = "malformed caption: unparseable authors section"

_FOR_THE_RE = re.compile(r"\bfor\s+the\b", flags=re.I)
_HAS_ALPHA_RE = re.compile(r"[A-Za-z]")

EMPTY_RECORD = {
    "title": None, "abstract": None, "authors": [], "collaborations": [],
    "dois": [], "date_published": None, "document_type": None,
}


def classify_document_type(type_text: str) -> str:
    """Keyword classification (reference: hepcrawl/parsers/arxiv.py:376-386)."""
    low = type_text.lower()
    if "thesis" in low:
        return "thesis"
    if "proceeding" in low or "conference" in low:
        return "conference paper"
    return "article"


def parse_caption(caption: str) -> dict:
    """Parse one caption into the golden-record struct (+ ``error``)."""
    if "<" in caption:  # fast path: tag cleanup only when tags present
        cleaned = remove_tags(caption, which_ones=("i", "b"))
        cleaned = convert_html_subscripts_to_latex(cleaned)
    else:
        cleaned = caption
    cleaned = clean_whitespace_characters(cleaned)

    # section split by marker indices (order: Authors [DOI] Published Type)
    ia = cleaned.find("Authors:")
    ip = cleaned.find("Published:", ia + 1) if ia >= 0 else -1
    it = cleaned.find("Type:", ip + 1) if ip >= 0 else -1
    if ia < 0 or ip < 0 or it < 0:
        return {**EMPTY_RECORD, "error": MALFORMED_MSG}
    idoi = cleaned.find("DOI:", ia)
    if idoi >= ip:
        idoi = -1
    sec_authors = cleaned[ia + 8:idoi if idoi >= 0 else ip].strip()
    sec_dois = cleaned[idoi + 4:ip].strip() if idoi >= 0 else None
    sec_date = cleaned[ip + 10:it].strip()
    sec_type = cleaned[it + 5:].strip()
    if sec_type.endswith("."):
        sec_type = sec_type[:-1]

    head = cleaned[:ia].strip().rstrip(".")
    title, _, abstract = head.partition(". ")
    title = title.strip() or None
    abstract = abstract.strip() or None

    authors, collaborations = [], []
    auth_text = sec_authors.rstrip(".").strip()
    if not auth_text or not _HAS_ALPHA_RE.search(auth_text):
        return {**EMPTY_RECORD, "error": MALFORMED_MSG}
    for piece in auth_text.split(";"):
        piece = piece.strip()
        if not piece:
            continue
        if _FOR_THE_RE.search(piece):
            coll, author_part = coll_cleanforthe(piece)
            if coll:
                collaborations.append(coll)
            piece = author_part or ""
        if piece:
            authors.append(parse_author_str(piece))

    dois = []
    if sec_dois:
        for val in sec_dois.rstrip(".").split(","):
            val = val.strip()
            if val:
                dois.append({"value": val, "material": "publication"})

    date_published = create_valid_date(sec_date.rstrip("."))
    document_type = classify_document_type(sec_type)

    return {
        "title": title, "abstract": abstract, "authors": authors,
        "collaborations": collaborations, "dois": dois,
        "date_published": date_published, "document_type": document_type,
        "error": None,
    }


# ---------------------------------------------------------------------------
# multi-format record parsing (ParsedItem.to_hep dispatch analog)
# ---------------------------------------------------------------------------

def parse_record(payload: str, record_format: str) -> dict:
    """Dispatch on record format, converging to ONE record schema.

    The reference accepts records in multiple formats ('hep' passes
    through patched, 'hepcrawl' goes through normalization; each source
    has its own parser class) and everything converges on the hep
    schema (reference: hepcrawl/utils.py:504-550 ``ParsedItem.to_hep``,
    hepcrawl/tohep.py:89-357).  Here: 'caption' (text grammar), 'json'
    and 'xml' payloads all normalize through the same field builders to
    the identical golden-record struct.
    """
    if record_format == "caption":
        return parse_caption(payload)
    if record_format == "json":
        return _parse_json_record(payload)
    if record_format == "xml":
        return _parse_xml_record(payload)
    if record_format == "marcxml":
        return _parse_marcxml_record(payload)
    if record_format == "hepcrawl":
        return _parse_hepcrawl_record(payload)
    return {**EMPTY_RECORD, "error": f"unknown record_format {record_format!r}"}


def _normalize_fields(title, abstract, author_strs, collab_strs, doi_strs,
                      raw_date, type_text) -> dict:
    """Shared normalization: the same builders every format goes through."""
    authors = [parse_author_str(a) for a in author_strs if a and a.strip()]
    collaborations = []
    for c in collab_strs:
        coll, _ = coll_cleanforthe(c)
        if coll:
            collaborations.append(coll)
    dois = [{"value": d.strip(), "material": "publication"}
            for d in doi_strs if d and d.strip()]
    return {
        "title": clean_whitespace_characters(title) if title else None,
        "abstract": clean_whitespace_characters(abstract) if abstract else None,
        "authors": authors,
        "collaborations": collaborations,
        "dois": dois,
        "date_published": create_valid_date(raw_date) if raw_date else None,
        "document_type": classify_document_type(type_text or ""),
        "error": None,
    }


def _parse_json_record(payload: str) -> dict:
    import json as _json

    try:
        rec = _json.loads(payload)
        return _normalize_fields(
            rec.get("title"), rec.get("abstract"),
            rec.get("authors", []), rec.get("collaborations", []),
            rec.get("dois", []), rec.get("date"), rec.get("type"))
    except Exception as exc:
        return {**EMPTY_RECORD, "error": f"bad json record: {exc}"}


def _parse_marcxml_record(payload: str) -> dict:
    """MARCXML -> the same golden struct, via the structural MARC
    parser (hepcrawl_ray.marc) and the shared field builders — the CDS
    branch of the reference's multi-format convergence
    (reference: hepcrawl/spiders/cds_spider.py:104-143)."""
    from hepcrawl_ray.marc import parse_marcxml

    rec = parse_marcxml(payload)
    if rec["error"]:
        return {**EMPTY_RECORD, "error": rec["error"]}
    return _normalize_fields(
        rec["title"], rec["abstract"],
        [a["full_name"] for a in rec["authors"]],
        rec["collaborations"], rec["dois"],
        rec["date_published"], rec["document_type"])


def _parse_hepcrawl_record(payload: str) -> dict:
    """Wide hepcrawl-format item (JSON) -> the same golden struct, via
    the full tohep normalization layer (reference: hepcrawl/tohep.py:
    89-357 — the 'hepcrawl' branch of ``ParsedItem.to_hep``,
    hepcrawl/utils.py:504-550)."""
    import json as _json

    from hepcrawl_ray.tohep import hepcrawl_to_hep, normalize_hepcrawl_record

    try:
        item = _json.loads(payload)
        source = item.get("acquisition_source", {}).get("source", "")
        rec = hepcrawl_to_hep(normalize_hepcrawl_record(item, source))
        title = rec.get("titles", [{}])[0].get("title")
        abstract = rec.get("abstracts", [{}])[0].get("value")
        return _normalize_fields(
            title, abstract,
            [a["full_name"] for a in rec.get("authors", [])],
            [c["value"] for c in rec.get("collaborations", [])],
            [d["value"] for d in rec.get("dois", [])],
            rec.get("imprints", [{}])[0].get("date"),
            rec["document_type"][0])
    except Exception as exc:
        return {**EMPTY_RECORD, "error": f"bad hepcrawl record: {exc}"}


def _parse_xml_record(payload: str) -> dict:
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(payload)

        def text(tag):
            el = root.find(tag)
            return el.text if el is not None else None

        return _normalize_fields(
            text("title"), text("abstract"),
            [el.text for el in root.findall("author")],
            [el.text for el in root.findall("collaboration")],
            [el.text for el in root.findall("doi")],
            text("date"), text("type"))
    except ET.ParseError as exc:
        return {**EMPTY_RECORD, "error": f"bad xml record: {exc}"}
