"""PoS (Proceedings of Science) record builders.

Reimplements (public behavior, stdlib ElementTree + html.parser,
original code) the spider-local builders of the reference's PoS
multi-hop chain (reference: hepcrawl/spiders/pos_spider.py:201-427).
The 3-hop FETCH chain itself (record -> paper page -> proceedings
page) is the iterative-crawl loop (pipelines/crawl.py); these are the
per-hop record builders:

- conference-paper item from the pex-dc OAI record + the two page
  urls: license from rights text, date/year via create_valid_date,
  journal title/volume/artid split out of the PoS identifier
  ``Title(VOL)artid`` on ``[()]`` (pos_spider.py:354-364), publisher
  as source, external system number, language suppressed for 'en',
  creator authors with affiliations, collections=[conferencepaper],
  the pdf document struct with %-quoted url (pos_spider.py:335-345)
- proceedings item from the proceedings html page: 'Proceedings, '
  + h1 title, conference_date div as subtitle, journal 'PoS' +
  volume from the pos id (pos_spider.py:266-301, 418-427)
- page-link extraction: the pdf link is the <a> whose text contains
  'pdf'; the proceedings internal id rides the first NON-pdf <a>
  (pos_spider.py:187-199, 303-323)
"""

from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET
from html.parser import HTMLParser
from urllib.parse import quote, urljoin

from hepcrawl_ray.functions.dates import create_valid_date
from hepcrawl_ray.functions.misc import get_licenses

_SPLIT_ID = re.compile(r"[()]")


def _strip_ns(root: ET.Element) -> ET.Element:
    for el in root.iter():
        if "}" in el.tag:
            el.tag = el.tag.split("}", 1)[1]
    return root


class _LinkAndTextParser(HTMLParser):
    """Collect (href, text) per <a>, first <h1> text, and the text of
    divs by class — the three shapes the PoS pages need."""

    def __init__(self):
        super().__init__()
        self.links: list[tuple[str, str]] = []
        self.h1: str | None = None
        self.div_text: dict[str, list[str]] = {}
        self._stack: list[tuple[str, dict]] = []

    def handle_starttag(self, tag, attrs):
        self._stack.append((tag, dict(attrs)))
        if tag == "a":
            self._cur_a = [dict(attrs).get("href", ""), ""]

    def handle_endtag(self, tag):
        while self._stack and self._stack[-1][0] != tag:
            self._stack.pop()
        if self._stack:
            self._stack.pop()
        if tag == "a" and getattr(self, "_cur_a", None) is not None:
            self.links.append(tuple(self._cur_a))
            self._cur_a = None

    def handle_data(self, data):
        for tag, attrs in self._stack:
            if tag == "a" and getattr(self, "_cur_a", None) is not None:
                self._cur_a[1] += data
            if tag == "h1" and self.h1 is None and data.strip():
                self.h1 = data
            if tag == "div" and attrs.get("class"):
                self.div_text.setdefault(attrs["class"], []).append(data)


def _parse_html(html: str) -> _LinkAndTextParser:
    p = _LinkAndTextParser()
    p.feed(html)
    return p


def get_conference_paper_pdf_url(page_html: str, base_url: str) -> str:
    """href of the <a> whose text contains 'pdf', joined to the base
    (reference: pos_spider.py:303-323).  Raises ValueError when absent
    (the reference's PoSExtractionException analog)."""
    for href, text in _parse_html(page_html).links:
        if "pdf" in text:
            return urljoin(base_url, href)
    raise ValueError("unable to get the conference paper pdf url")


def get_proceedings_page_url(page_html: str, base_proceedings_url: str) -> str:
    """Internal id from the first NON-pdf link's href path segment
    (reference: pos_spider.py:187-199)."""
    for href, text in _parse_html(page_html).links:
        if "pdf" not in text:
            return base_proceedings_url + href.split("/")[1]
    raise ValueError("no proceedings link on page")


def journal_title_of(pos_ext_identifier: str) -> str:
    return _SPLIT_ID.split(pos_ext_identifier)[0]


def journal_volume_of(pos_ext_identifier: str) -> str:
    return _SPLIT_ID.split(pos_ext_identifier)[1]


def journal_artid_of(pos_ext_identifier: str) -> str:
    return _SPLIT_ID.split(pos_ext_identifier)[2]


def _dc(root: ET.Element, tag: str) -> str | None:
    return root.findtext(f".//metadata/pex-dc/{tag}")


def get_authors(root: ET.Element) -> list[dict]:
    """creator nodes -> raw_name + affiliation structs
    (reference: pos_spider.py:387-416)."""
    authors = []
    for creator in root.findall(".//metadata/pex-dc/creator"):
        d: dict = {}
        name = creator.find(".//name")
        d["raw_name"] = "".join(name.itertext()) if name is not None else ""
        affs = ["".join(a.itertext())
                for a in creator.findall(".//affiliation")]
        if affs:
            d["affiliations"] = [{"value": a} for a in affs]
        if d:
            authors.append(d)
    return authors


def build_conference_paper_item(xml_record: str, conference_paper_url: str,
                                conference_paper_pdf_url: str) -> dict:
    """pex-dc record + page urls -> hepcrawl-format conference-paper
    item (reference: pos_spider.py:201-264).  Error-row contract."""
    try:
        root = _strip_ns(ET.fromstring(xml_record))
    except ET.ParseError as exc:
        return {"error": f"bad pos record: {exc}", "collections": []}
    identifier = _dc(root, "identifier") or ""
    date = create_valid_date(_dc(root, "date") or "")
    language = _dc(root, "language")
    try:
        journal_title = journal_title_of(identifier)
        journal_volume = journal_volume_of(identifier)
        journal_artid = journal_artid_of(identifier)
    except IndexError:
        return {"error": f"bad pos identifier: {identifier!r}",
                "collections": []}
    return {
        "license": get_licenses(license_text=_dc(root, "rights")),
        "date_published": date,
        "journal_year": int(date[:4]) if date else None,
        "journal_title": journal_title,
        "journal_volume": journal_volume,
        "journal_artid": journal_artid,
        "title": _dc(root, "title"),
        "source": _dc(root, "publisher"),
        "external_system_numbers": [
            {"institute": "pos", "value": root.findtext(".//identifier")}],
        "language": language if language != "en" else None,
        "authors": get_authors(root),
        "collections": ["conferencepaper"],
        "urls": [conference_paper_url],
        "documents": get_documents(conference_paper_pdf_url),
        "error": None,
    }


def get_documents(path: str) -> list[dict]:
    """The pdf document struct (reference: pos_spider.py:335-345)."""
    return [{
        "key": os.path.basename(path),
        "url": quote(path, safe=":/"),
        "original_url": quote(path, safe=":/"),
        "hidden": True,
        "fulltext": True,
    }]


def build_conference_proceedings_item(proceedings_page_html: str,
                                      pos_id: str) -> dict:
    """Proceedings html page -> hepcrawl-format proceedings item
    (reference: pos_spider.py:266-301, 418-427)."""
    page = _parse_html(proceedings_page_html)
    try:
        journal_volume = journal_volume_of(pos_id)
    except IndexError:
        return {"error": f"bad pos identifier: {pos_id!r}",
                "collections": []}
    return {
        "collections": ["proceedings"],
        "title": "Proceedings, " + (page.h1 or ""),
        "subtitle": "".join(page.div_text.get("conference_date", [])),
        "journal_title": "PoS",
        "journal_volume": journal_volume,
        "error": None,
    }
