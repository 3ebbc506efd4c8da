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

_SECTIONS_RE = re.compile(
    r"^(?P<head>.*?)\s*Authors:\s*(?P<authors>.*?)\s*"
    r"(?:DOI:\s*(?P<dois>.*?)\s*)?"
    r"Published:\s*(?P<date>.*?)\s*Type:\s*(?P<type>.*?)\.?\s*$"
)

MALFORMED_MSG = "malformed caption: unparseable authors section"

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
    cleaned = remove_tags(caption, which_ones=("i", "b"))
    cleaned = convert_html_subscripts_to_latex(cleaned)
    cleaned = clean_whitespace_characters(cleaned)

    m = _SECTIONS_RE.match(cleaned)
    if not m:
        return {**EMPTY_RECORD, "error": MALFORMED_MSG}

    head = m.group("head").rstrip(".")
    title, _, abstract = head.partition(". ")
    title = title.strip() or None
    abstract = abstract.strip() or None

    authors, collaborations = [], []
    auth_text = m.group("authors").rstrip(".").strip()
    if not auth_text or not re.search(r"[A-Za-z]", auth_text):
        return {**EMPTY_RECORD, "error": MALFORMED_MSG}
    for piece in auth_text.split(";"):
        piece = piece.strip()
        if not piece:
            continue
        if re.search(r"\bfor\s+the\b", piece, flags=re.I):
            coll, author_part = coll_cleanforthe(piece)
            if coll:
                collaborations.append(coll)
            piece = author_part or ""
        if piece:
            authors.append(parse_author_str(piece))

    dois = []
    if m.group("dois"):
        for val in m.group("dois").rstrip(".").split(","):
            val = val.strip()
            if val:
                dois.append({"value": val, "material": "publication"})

    date_published = create_valid_date(m.group("date").rstrip("."))
    document_type = classify_document_type(m.group("type"))

    return {
        "title": title, "abstract": abstract, "authors": authors,
        "collaborations": collaborations, "dois": dois,
        "date_published": date_published, "document_type": document_type,
        "error": None,
    }
