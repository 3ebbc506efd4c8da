"""NLM (PubMed-style) XML record extractor.

Reimplements (public behavior, stdlib ElementTree) the reference's NLM
extractor mixin (reference: hepcrawl/extractors/nlm.py:18-158):

- authors from AuthorList//Author with First/Middle/LastName merge and
  per-author Affiliation structs (nlm.py:18-44)
- collections derived from the doctype (Review / conference doctype
  adds a collection; nlm.py:46-55)
- DOI from ArticleIdList[IdType=doi], falling back to
  ELocationID[EIdType=doi] (nlm.py:57-66)
- publication date assembled year[-month[-day]] (nlm.py:68-83)
- pub status from Journal/PubDate@PubStatus (nlm.py:85-101) — the
  IOP drop-filter predicate consumes this
  (reference: hepcrawl/spiders/iop_spider.py:170-172)
- doctype from the first PublicationType (nlm.py:103-134)
- page numbers: (first, last, count = last - first + 1) (nlm.py:136-158)
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

# pub statuses the IOP-style filter drops
# (reference: hepcrawl/spiders/iop_spider.py:170-172)
DROP_PUB_STATUSES = ("aheadofprint", "received")


def get_authors(root) -> list[dict]:
    authors = []
    alist = root.find(".//AuthorList")
    if alist is None:
        return authors
    for a in alist.iter("Author"):
        surname = a.findtext("LastName") or ""
        first = a.findtext("FirstName")
        middle = a.findtext("MiddleName")
        if first and middle:
            given = f"{first} {middle}"
        elif first:
            given = first
        else:
            given = ""
        d = {"surname": surname, "given_names": given}
        affs = [e.text for e in a.iter("Affiliation") if e.text]
        if affs:
            d["affiliations"] = [{"value": v} for v in affs]
        authors.append(d)
    return authors


def get_collections(doctype: str | None) -> list[str]:
    collections = ["HEP", "Citeable", "Published"]
    if doctype:
        if doctype == "Review":
            collections.append("Review")
        if "conference" in doctype.lower():
            collections.append("ConferencePaper")
    return collections


def get_keywords(root) -> list[str]:
    """Free keywords from the IOP object list (reference:
    iop_spider.py:200-203 — ObjectList/Object[@Type='keyword']/
    Param[@Name='value'])."""
    out = []
    for obj in root.findall(".//ObjectList/Object"):
        if (obj.get("Type") or "").lower() != "keyword":
            continue
        for param in obj.findall("Param"):
            if param.get("Name") == "value" and param.text:
                out.append(param.text.strip())
    return out


def get_dois(root) -> list[str]:
    dois = [e.text for e in root.findall(
        ".//ArticleIdList/ArticleId[@IdType='doi']") if e.text]
    if not dois:
        dois = [e.text for e in root.iter("ELocationID")
                if e.get("EIdType") == "doi" and e.text]
    return dois


def get_date_published(root) -> str:
    pd = root.find(".//Journal/PubDate")
    if pd is None:
        return ""
    out = pd.findtext("Year") or ""
    month = pd.findtext("Month")
    day = pd.findtext("Day")
    if out and month:
        out += "-" + month
        if day:
            out += "-" + day
    return out


def get_pub_status(root) -> str | None:
    pd = root.find(".//Journal/PubDate")
    return pd.get("PubStatus") if pd is not None else None


def get_doctype(root) -> str | None:
    el = root.find(".//PublicationType")
    return el.text if el is not None else None


def get_page_numbers(root) -> tuple[str | None, str | None, str]:
    fpage = root.findtext(".//FirstPage")
    lpage = root.findtext(".//LastPage")
    # electronic page ids ('e1234', 'S12', 'iv') are common: a count is
    # only derivable from plain numeric pages (error-row contract —
    # never raise out of a record parse)
    page_nr = ""
    if fpage and lpage:
        try:
            page_nr = str(int(lpage) - int(fpage) + 1)
        except ValueError:
            page_nr = ""
    return fpage, lpage, page_nr


def should_drop(pub_status: str | None) -> bool:
    """The IOP-style pub-status drop predicate."""
    return pub_status in DROP_PUB_STATUSES


def parse_nlm(xml_str: str) -> dict:
    """One NLM Article node -> record dict (error-row contract)."""
    try:
        root = ET.fromstring(xml_str)
    except ET.ParseError as exc:
        return {"title": None, "authors": [], "dois": [],
                "date_published": "", "pub_status": None, "doctype": None,
                "collections": [], "fpage": None, "lpage": None,
                "page_nr": "", "free_keywords": [], "dropped": False,
                "error": f"bad nlm record: {exc}"}
    doctype = get_doctype(root)
    status = get_pub_status(root)
    fpage, lpage, page_nr = get_page_numbers(root)
    return {
        "title": root.findtext(".//ArticleTitle"),
        "authors": get_authors(root),
        "dois": get_dois(root),
        "date_published": get_date_published(root),
        "pub_status": status,
        "doctype": doctype,
        "collections": get_collections(doctype),
        "fpage": fpage, "lpage": lpage, "page_nr": page_nr,
        "free_keywords": get_keywords(root),
        "dropped": should_drop(status),
        "error": None,
    }
