"""EDP Sciences record helpers: JATS-flavoured reference parsing plus
the 'rich' (non-JATS) metadata shapes.

Reimplements (public behavior, stdlib ElementTree, original code) the
spider-local builders of the reference's EDP spider
(reference: hepcrawl/spiders/edp_spider.py:410-615):

- references: one dict per ref (or per mixed-citation under a shared
  label, with the sublabel from the citation @id's last char), with
  doctype from @publication-type, doi/url split out of ext-link hrefs
  ('doi' links become 'doi:<suffix>' with the dx.doi.org prefix
  stripped), authors 'surname, given' joins, journal title + section
  fold via get_journal_and_section (section letter prefixes the
  volume), publisher with its location prefixed from publisher-loc or
  the tail text after publisher-name, and the raw reference
  (edp_spider.py:410-516)
- date_published 'rich' shape: Year[-MonthNumber]
  (edp_spider.py:518-527)
- collections: conference node or the IJMP Conference Series journal
  -> ConferencePaper; review-article -> Review; else Published
  (edp_spider.py:529-537)
- JATS authors with the EDP e-mail-in-affiliation strip
  (edp_spider.py:539-585) and the 'rich' author shape
  (edp_spider.py:587-615)
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from hepcrawl_ray.functions.misc import get_journal_and_section

CONFERENCE_SERIES_TITLE = \
    "International Journal of Modern Physics: Conference Series"


def _strip_ns(root: ET.Element) -> ET.Element:
    for el in root.iter():
        if "}" in el.tag:
            el.tag = el.tag.split("}", 1)[1]
        for k in list(el.attrib):
            if "}" in k:
                el.attrib[k.split("}", 1)[1]] = el.attrib.pop(k)
    return root


def _root_of(xml_or_root) -> ET.Element:
    if isinstance(xml_or_root, str):
        return _strip_ns(ET.fromstring(xml_or_root))
    return xml_or_root


def get_external_links(ref: ET.Element) -> tuple[str, list[str]]:
    """DOI + other urls from ext-link hrefs
    (reference: edp_spider.py:505-516)."""
    doi = ""
    urls = []
    for el in ref.iter("ext-link"):
        href = el.get("href") or ""
        if "doi" in href:
            doi = "doi:" + href.replace("http://dx.doi.org/", "")
        else:
            urls.append(href)
    return doi, urls


def parse_reference(ref: ET.Element, label: str | None,
                    source_text: str | None = None) -> dict:
    """One citation node -> reference dict
    (reference: edp_spider.py:429-503)."""
    reference: dict = {}
    raw_reference = source_text if source_text is not None \
        else ET.tostring(ref, encoding="unicode")

    sublabel = ref.get("id")
    if label and sublabel:
        label = label + sublabel[-1]
    reference["number"] = label

    ref_type = ref.get("publication-type")
    doi, urls = get_external_links(ref)
    collaboration = None
    for c in ref.iter("collab"):
        collaboration = c.text
        break

    authors = []
    for name in ref.iter("string-name"):
        surname = name.findtext(".//surname")
        given = name.findtext(".//given-names")
        authors.append(f"{surname}, {given}")

    def first(tag):
        for el in ref.iter(tag):
            return el.text
        return None

    title = first("article-title")
    publication = first("source")
    fpage = first("fpage")
    issue = first("issue")
    volume = first("volume")
    year = first("year")
    publisher = first("publisher-name")
    publisher_loc = first("publisher-loc")
    if not publisher_loc:
        # the reference reads the text node following publisher-name,
        # which in ElementTree is exactly the element's tail
        for el in ref.iter("publisher-name"):
            publisher_loc = el.tail
            break
    if publisher and publisher_loc:
        publisher = publisher_loc.strip(",. ") + ": " + publisher

    if publication:
        journal_title, section = get_journal_and_section(publication)
        if journal_title:
            reference["journal_title"] = journal_title
            if volume:
                reference["journal_volume"] = section + volume
    if ref_type:
        reference["doctype"] = ref_type
    if urls:
        reference["url"] = urls
    if doi:
        reference["doi"] = doi
    if fpage:
        reference["fpage"] = fpage
    if title:
        reference["title"] = title
    if issue:
        reference["issue"] = issue
    if year:
        reference["year"] = year
    if authors:
        reference["authors"] = authors
    if collaboration:
        reference["collaboration"] = collaboration
    if publisher:
        reference["publisher"] = publisher
    if raw_reference:
        reference["raw_reference"] = raw_reference
    return reference


def get_references(xml_or_root) -> list[dict]:
    """All references under ref-list; refs with mixed-citation children
    yield one dict per citation (reference: edp_spider.py:410-427)."""
    root = _root_of(xml_or_root)
    references = []
    for ref in root.iter("ref"):
        label = ref.findtext("label")
        if label:
            label = label.strip("[].")
        inner = list(ref.iter("mixed-citation"))
        if not inner:
            references.append(parse_reference(ref, label))
        for citation in inner:
            references.append(parse_reference(citation, label))
    return references


def get_date_published_rich(xml_or_root) -> str:
    """Year[-MonthNumber] (reference: edp_spider.py:518-527)."""
    root = _root_of(xml_or_root)
    year = root.findtext(".//Year")
    month = root.findtext(".//MonthNumber")
    out = ""
    if year:
        out = year
        if month:
            out += "-" + month
    return out


def get_collections(xml_or_root, article_type: str | None,
                    current_journal_title: str | None) -> list[str]:
    """Collection dispatch (reference: edp_spider.py:529-537)."""
    root = _root_of(xml_or_root)
    if root.find(".//conference") is not None \
            or current_journal_title == CONFERENCE_SERIES_TITLE:
        return ["HEP", "ConferencePaper"]
    if article_type == "review-article":
        return ["HEP", "Review"]
    return ["HEP", "Published"]


def _strip_email_affiliations(affs: list[str]) -> list[str]:
    """EDP affiliation lines embed the contact e-mail; strip it
    (reference: edp_spider.py:560-576)."""
    no_email = [a.split("e-mail")[0].strip() for a in affs if "e-mail" in a]
    return no_email or affs


def get_authors_jats(xml_or_root) -> list[dict]:
    """EDP-flavoured JATS authors (reference: edp_spider.py:539-585)."""
    root = _root_of(xml_or_root)
    authors = []
    for contrib in root.iter("contrib"):
        if contrib.get("contrib-type") != "author":
            continue
        surname = contrib.findtext("name/surname") or ""
        given = contrib.findtext("name/given-names") or ""
        email = contrib.findtext("email")
        affs = ["".join(a.itertext()) for a in contrib.findall("aff")]
        rid = None
        for x in contrib.findall("xref"):
            if x.get("ref-type") == "aff":
                rid = x.get("rid")
                break
        if rid:
            for aff in root.iter("aff"):
                if aff.get("id") == rid:
                    v = aff.findtext("addr-line/institution") \
                        or aff.findtext("addr-line")
                    if v:
                        affs.append(v)
                    break
        affs = _strip_email_affiliations(affs)
        authors.append({
            "surname": surname,
            "given_names": given,
            "affiliations": [{"value": a} for a in affs],
            "email": email,
        })
    return authors


def get_authors_rich(xml_or_root) -> list[dict]:
    """The 'rich' (non-JATS) author shape
    (reference: edp_spider.py:587-615)."""
    root = _root_of(xml_or_root)
    authors = []
    for contrib in root.iter("Author"):
        an = contrib.find("AuthorName")
        surname = fname = mname = None
        if an is not None:
            surname = next((e.text for e in an.iter("LastName")), None)
            fname = next((e.text for e in an.iter("FirstName")), None)
            mname = next((e.text for e in an.iter("MiddleName")), None)
        given = ""
        if fname:
            given = fname + (" " + mname if mname else "")
        affiliations = []
        aff_el = contrib.find("AffiliationID")
        rid = aff_el.get("Label") if aff_el is not None else None
        if rid:
            for aff in root.iter("Affiliation"):
                if aff.get("ID") == rid:
                    affiliations = [
                        {"value": v.text} for v in
                        aff.findall("UnstructuredAffiliation") if v.text]
                    break
        authors.append({"surname": surname, "given_names": given,
                        "affiliations": affiliations})
    return authors
