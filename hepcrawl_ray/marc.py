"""MARCXML record parser — the CDS path analog.

The reference delegates CDS MARCXML to ``inspire_dojson``'s
``cds_marcxml2record`` inside a Flask app context and wraps any
exception into an error item
(reference: hepcrawl/spiders/cds_spider.py:104-143).  The dojson rules
themselves are a large public mapping table; this module implements
the structural layer (controlfield/datafield/subfield access keyed by
(tag, ind1, ind2, code)) plus the hallmark HEP field mappings so a CDS
record converges to the same golden-record struct the other formats
produce:

- 001 record id, 035$a external ids
- 245$a title, 520$a abstract
- 100/700 $a authors (with $u affiliation)
- 710$g collaborations
- 024(7)$a DOIs (when $2 == 'doi')
- 260$c / 269$c publication date
- 980$a collections -> document type (THESIS / CONFERENCEPAPER map)
- 540$a license, 856(4)$u urls

Error contract: malformed XML or a mapping failure returns an error
row, never an exception (cds_spider.py:132-143).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET


class MarcRecord:
    """Structured access over one ``<record>`` of MARCXML."""

    def __init__(self, xml_str: str):
        root = ET.fromstring(xml_str)
        rec = root if root.tag.rsplit("}", 1)[-1] == "record" \
            else root.find(".//record")
        if rec is None:
            raise ValueError("no <record> element")
        self.controlfields: dict[str, str] = {}
        # (tag) -> list of {ind1, ind2, subfields: [(code, value)]}
        self.datafields: dict[str, list[dict]] = {}
        for el in rec:
            tag_name = el.tag.rsplit("}", 1)[-1]
            if tag_name == "controlfield":
                self.controlfields[el.get("tag")] = el.text or ""
            elif tag_name == "datafield":
                subs = [(s.get("code"), s.text or "") for s in el
                        if s.tag.rsplit("}", 1)[-1] == "subfield"]
                self.datafields.setdefault(el.get("tag"), []).append({
                    "ind1": (el.get("ind1") or " ").strip(),
                    "ind2": (el.get("ind2") or " ").strip(),
                    "subfields": subs,
                })

    def values(self, tag: str, code: str, ind1: str | None = None) -> list[str]:
        out = []
        for f in self.datafields.get(tag, []):
            if ind1 is not None and f["ind1"] != ind1:
                continue
            out.extend(v for c, v in f["subfields"] if c == code and v)
        return out

    def first(self, tag: str, code: str, ind1: str | None = None) -> str | None:
        vals = self.values(tag, code, ind1)
        return vals[0] if vals else None


_COLLECTION_DOCTYPE = {
    "THESIS": "thesis",
    "CONFERENCEPAPER": "conference paper",
    "PROCEEDINGS": "conference paper",
    "BOOK": "book",
    "NOTE": "note",
}


def marcxml_to_record(xml_str: str) -> dict:
    """One MARCXML record -> golden-record-analog dict."""
    rec = MarcRecord(xml_str)

    authors = []
    for tag in ("100", "700"):
        for f in rec.datafields.get(tag, []):
            name = next((v for c, v in f["subfields"] if c == "a" and v), None)
            if not name:
                continue
            affs = [v for c, v in f["subfields"] if c == "u" and v]
            authors.append({"full_name": name,
                            "affiliations": [{"value": a} for a in affs]})

    dois = []
    for f in rec.datafields.get("024", []):
        if f["ind1"] != "7":
            continue
        scheme = next((v for c, v in f["subfields"] if c == "2"), "")
        if scheme.lower() != "doi":
            continue
        dois.extend(v for c, v in f["subfields"] if c == "a" and v)

    doc_type = "article"
    for coll in rec.values("980", "a"):
        mapped = _COLLECTION_DOCTYPE.get(coll.upper())
        if mapped:
            doc_type = mapped
            break

    return {
        "record_id": rec.controlfields.get("001"),
        "external_ids": rec.values("035", "a"),
        "title": rec.first("245", "a"),
        "abstract": rec.first("520", "a"),
        "authors": authors,
        "collaborations": rec.values("710", "g"),
        "dois": dois,
        "date_published": rec.first("260", "c") or rec.first("269", "c"),
        "document_type": doc_type,
        "license": rec.first("540", "a"),
        "urls": rec.values("856", "u", ind1="4"),
        # envelope fields (reference: hindawi_spider.py:181-234 —
        # page_nr from 300$a, publisher source from 260$b, raw
        # collection names from 980$a)
        "page_nr": rec.values("300", "a"),
        "source": rec.first("260", "b"),
        "collections": rec.values("980", "a"),
        "error": None,
    }


def parse_marcxml(xml_str: str) -> dict:
    """Error-wrapped parse (reference: cds_spider.py:132-143)."""
    try:
        return marcxml_to_record(xml_str)
    except Exception as exc:
        return {"record_id": None, "external_ids": [], "title": None,
                "abstract": None, "authors": [], "collaborations": [],
                "dois": [], "date_published": None, "document_type": None,
                "license": None, "urls": [],
                "error": f"bad marcxml record: {exc!r}"}
