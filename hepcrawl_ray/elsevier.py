"""Elsevier full-text XML record parser.

Reimplements (public behavior, stdlib ElementTree, original code) the
semantics of the reference's Elsevier parser
(reference: hepcrawl/parsers/elsevier.py:92-696):

- article type via the published docsubtype-abbreviation map
  (elsevier.py:24-66) and material classification derived from it
  (erratum/addendum/retraction/removal/duplicate -> themselves,
  editorial / publisher's note -> 'editorial note', else
  'publication'; elsevier.py:366-381)
- copyright: holder from the item-info copyright text, falling back
  to the published copyright-type map (elsevier.py:68-77, 232-263);
  statement prefers the RDF Description copyright; year from @year
- document type from the root child (article / book / book-chapter),
  overridden to 'conference paper' when conference-info exists or the
  RDF issueName matches proceedings|proc. (elsevier.py:274-301)
- journal title: RDF publicationName (jid fallback) with ' Section'
  removal and comma strip (elsevier.py:303-310); issue from
  serial-issue/issue-info/issue-first; volume from RDF
- DOIs: RDF doi + the simple-article refers-to-document publication
  DOI (elsevier.py:265-272)
- abstract from head/abstract (non-graphical) simple-para paragraphs,
  simple-head fallback (elsevier.py:166-181); title/subtitle with the
  same head -> simple-head fallback
- authors: 'surname, given-name, suffix' join; affiliations resolved
  by cross-ref @refid (containing 'af') against affiliation[@id],
  else the group's own affiliation textfn; emails from
  e-address[@type=email] (elsevier.py:468-547)
- license (RDF licenseLine + openAccessInformation/userLicense),
  keywords (non-abbreviated), collaborations, publisher with the
  'Elsevier B.V.' default
- dates: imprints from availableOnline, publication date from
  coverDisplayDate with the month-range fallback ('July-September
  2020' -> 'September 2020'; elsevier.py:397-420)
- publication_info assembly (artid from item-info/aid, pages from RDF
  startingPage/endingPage, year; elsevier.py:422-435)
- references from bib-reference/reference|other-ref: label strip,
  series maintitle as journal, volume-nr/issue-nr, date as year,
  inter-ref url, doi, pages/article-number page_artid, authors and
  editors (elsevier.py:549-678)
- the harvest predicate (elsevier.py:686-696) — shared with
  sources/paged.py's vectorized twin

The unit flowing through Ray is a plain dict; parse errors become
error ROWS (never exceptions), matching the engine's error-channel
contract.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

from hepcrawl_ray.functions.dates import create_valid_date
from hepcrawl_ray.sources.paged import DOCTYPES_TO_HARVEST

# docsubtype abbreviation -> article type
# (domain constants, reference: hepcrawl/parsers/elsevier.py:24-66)
DOCTYPE_MAPPING = {
    "abs": "abstract", "add": "addendum", "adv": "advertisement",
    "ann": "announcement", "brv": "book-review", "cal": "calendar",
    "chp": "chapter", "cnf": "conference", "con": "contents list",
    "cor": "correspondence", "cop": "copyright", "crp": "case report",
    "dat": "data article", "dis": "discussion", "dup": "duplicate",
    "edb": "editorial board", "edi": "editorial", "err": "erratum",
    "exm": "examination", "fla": "full-length article", "ind": "index",
    "lit": "literature alert", "lst": "list", "mic": "micro article",
    "mis": "miscellaneous", "nws": "news", "ocn": "other contents",
    "osp": "original software publication", "pgl": "practice guideline",
    "pnt": "patent report", "prp": "personal report",
    "prv": "product review", "pub": "publisher's note", "rem": "removal",
    "req": "request for assistance", "ret": "retraction",
    "rev": "review article", "rpl": "replication studies",
    "sco": "short communication", "ssu": "short survey",
    "vid": "video article",
}

# copyright @type -> holder (domain constants, reference: elsevier.py:68-77)
COPYRIGHT_MAPPING = {
    "crown": "Crown copyright",
    "free-of-copyright": "None",
    "full-transfer": "Publisher",
    "joint": "Publisher and scientific society",
    "limited-transfer": "Authors and publisher",
    "other": "Authors",
    "society": "Scientific society",
    "us-gov": " US government",
}

_MATERIAL_SELF = ("erratum", "addendum", "retraction", "removal", "duplicate")
_MATERIAL_EDITORIAL = ("editorial", "publisher's note")
_CONFERENCE_RE = re.compile(r"proceedings|proc.")
_SECTION_RE = re.compile(" [Ss]ection")
_MONTH_RANGE_RE = re.compile("[A-aZ-z]*-(?=[A-aZ-z])")


def _strip_ns(root: ET.Element) -> ET.Element:
    """Drop XML namespaces in-place (the reference calls
    ``remove_namespaces()`` on its selector; elsevier.py:510-529)."""
    for el in root.iter():
        if "}" in el.tag:
            el.tag = el.tag.split("}", 1)[1]
        for k in list(el.attrib):
            if "}" in k:
                el.attrib[k.split("}", 1)[1]] = el.attrib.pop(k)
    return root


def _text(el: ET.Element | None) -> str | None:
    """Whole-subtree text (the ``string()`` xpath function)."""
    if el is None:
        return None
    s = "".join(el.itertext())
    return s if s else None


def _findtext(root, path: str) -> str | None:
    return _text(root.find(path))


class ElsevierRecordParser:
    """Parser over one namespace-stripped Elsevier record root.

    The root holds the RDF metadata sibling (``RDF/Description``) and
    the article body (``article`` / ``simple-article`` / ``book`` /
    ``book-chapter`` ...), matching the reference's combined selector.
    """

    def __init__(self, xml_or_root, source: str | None = None):
        if isinstance(xml_or_root, str):
            root = ET.fromstring(xml_or_root)
        else:
            root = xml_or_root
        self.root = _strip_ns(root)
        self._desc = self.root.find("./RDF/Description")
        self.source = source or self.publisher

    # -- metadata -----------------------------------------------------

    def _rdf(self, tag: str) -> str | None:
        if self._desc is None:
            return None
        return _findtext(self._desc, tag)

    @property
    def article_type(self) -> str | None:
        for el in self.root.iter():
            ab = el.get("docsubtype")
            if ab:
                return DOCTYPE_MAPPING.get(ab)
        return None

    @property
    def material(self) -> str:
        at = self.article_type
        if at in _MATERIAL_SELF:
            return at
        if at in _MATERIAL_EDITORIAL:
            return "editorial note"
        return "publication"

    @property
    def document_type(self) -> str | None:
        doctype = None
        for child in self.root:
            if "article" in child.tag or child.tag == "book-review":
                doctype = "article"
                break
        else:
            tags = {c.tag for c in self.root}
            if tags & {"book", "simple-book"}:
                doctype = "book"
            elif "book-chapter" in tags:
                doctype = "book chapter"
        if self.is_conference_paper:
            doctype = "conference paper"
        return doctype

    @property
    def is_conference_paper(self) -> bool:
        if self.root.find("./conference-info") is not None:
            return True
        issue_name = self._rdf("issueName")
        if issue_name:
            return bool(_CONFERENCE_RE.search(issue_name.lower()))
        return False

    @property
    def publisher(self) -> str:
        return self._rdf("publisher") or "Elsevier B.V."

    @property
    def journal_title(self) -> str:
        jid = self._findtext_item_info("jid") or ""
        publication = self._rdf("publicationName") or jid
        return _SECTION_RE.sub("", publication).replace(",", "").strip()

    @property
    def journal_issue(self) -> str | None:
        return _findtext(self.root, "./serial-issue/issue-info/issue-first")

    @property
    def journal_volume(self) -> str | None:
        return self._rdf("volume")

    def _findtext_item_info(self, tag: str) -> str | None:
        for child in self.root:
            v = _findtext(child, f"./item-info/{tag}")
            if v:
                return v
        return None

    @property
    def artid(self) -> str | None:
        return self._findtext_item_info("aid")

    def _copyright_el(self) -> ET.Element | None:
        for child in self.root:
            el = child.find("./item-info/copyright[@type]")
            if el is not None:
                return el
        return None

    @property
    def copyright_holder(self) -> str | None:
        el = self._copyright_el()
        holder = _text(el)
        if not holder and el is not None:
            holder = COPYRIGHT_MAPPING.get(el.get("type"))
        return holder

    @property
    def copyright_statement(self) -> str | None:
        return self._rdf("copyright") or _text(self._copyright_el())

    @property
    def copyright_year(self) -> int | None:
        el = self._copyright_el()
        if el is None:
            return None
        try:
            return int(el.get("year"))
        except (TypeError, ValueError):
            return None

    @property
    def copyright(self) -> dict:
        return {"holder": self.copyright_holder,
                "material": self.material,
                "statement": self.copyright_statement,
                "year": self.copyright_year}

    @property
    def dois(self) -> list[dict]:
        result = [{"doi": self._rdf("doi"), "material": self.material}]
        pub_doi = _findtext(
            self.root, "./simple-article/item-info/document-thread/"
            "refers-to-document/doi")
        if pub_doi:
            result.append({"doi": pub_doi, "material": "publication"})
        return result

    @property
    def page_start(self) -> str | None:
        return self._rdf("startingPage")

    @property
    def page_end(self) -> str | None:
        return self._rdf("endingPage")

    @property
    def imprints_date(self) -> str | None:
        raw = self._rdf("availableOnlineInformation/availableOnline")
        return create_valid_date(raw) if raw else None

    @property
    def publication_date(self) -> str | None:
        raw = self._rdf("coverDisplayDate")
        if not raw:
            return None
        iso = create_valid_date(raw)
        if iso is None:
            # month ranges ('July-September 2020'): keep the last month
            iso = create_valid_date(_MONTH_RANGE_RE.sub("", raw))
        return iso

    @property
    def year(self) -> int | None:
        pub = self.publication_date
        return int(pub[:4]) if pub else None

    @property
    def publication_info(self) -> dict:
        return {"artid": self.artid,
                "journal_title": self.journal_title,
                "journal_issue": self.journal_issue,
                "journal_volume": self.journal_volume,
                "material": self.material,
                "page_start": self.page_start,
                "page_end": self.page_end,
                "year": self.year}

    # -- head ---------------------------------------------------------

    def _head_first(self, subpath: str) -> ET.Element | None:
        """``./*/head/<subpath>`` with the simple-head fallback."""
        for head_tag in ("head", "simple-head"):
            for child in self.root:
                el = child.find(f"./{head_tag}/{subpath}")
                if el is not None:
                    return el
        return None

    @property
    def title(self) -> str | None:
        t = _text(self._head_first("title"))
        return t.strip("\n") if t else None

    @property
    def subtitle(self) -> str | None:
        return _text(self._head_first("subtitle"))

    @property
    def abstract(self) -> str | None:
        for head_tag in ("head", "simple-head"):
            paras = []
            for child in self.root:
                for ab in child.findall(f"./{head_tag}/abstract"):
                    if ab.get("graphical"):
                        continue
                    for p in ab.findall("./abstract-sec/simple-para"):
                        paras.append((_text(p) or "").strip("/ \n"))
            if paras:
                return " ".join(paras)
        return None

    @property
    def keywords(self) -> list[str]:
        for head_tag in ("head", "simple-head"):
            out = []
            for child in self.root:
                for kws in child.findall(f"./{head_tag}/keywords"):
                    if kws.get("abr"):
                        continue
                    out.extend(t for t in
                               (_findtext(k, "text")
                                for k in kws.findall("keyword")) if t)
            if out:
                return out
        return []

    @property
    def license(self) -> dict:
        return {"license": self._rdf("licenseLine"),
                "material": self.material,
                "url": self._rdf("openAccessInformation/userLicense")}

    # -- authors ------------------------------------------------------

    def _author_groups(self) -> list[ET.Element]:
        for head_tag in ("head", "simple-head"):
            groups = [g for child in self.root
                      for g in child.findall(f"./{head_tag}/author-group")]
            if groups:
                return groups
        return []

    @property
    def collaborations(self) -> list[str]:
        out = []
        for g in self._author_groups():
            out.extend(t for t in
                       (_findtext(c, "text")
                        for c in g.iter("collaboration")) if t)
        return out

    @staticmethod
    def get_author_name(author: ET.Element) -> str:
        surname = _findtext(author, "surname")
        given = _findtext(author, "given-name")
        suffix = _text(next(author.iter("suffix"), None))
        return ", ".join(p for p in (surname, given, suffix) if p)

    def get_author_affiliations(self, author: ET.Element,
                                group: ET.Element) -> list[str]:
        ref_ids = [r.get("refid") for r in author.iter()
                   if r.get("refid") and "af" in r.get("refid")]
        if ref_ids:
            affs = []
            for rid in ref_ids:
                for el in self.root.iter("affiliation"):
                    if el.get("id") == rid:
                        affs.append(_findtext(el, "textfn"))
                        break
                else:
                    affs.append(None)
            return affs
        return [v for v in (_findtext(a, "textfn")
                            for a in group.findall("affiliation")) if v]

    @staticmethod
    def get_author_emails(author: ET.Element) -> list[str]:
        return [t for t in
                (_text(e) for e in author.findall("e-address")
                 if e.get("type") == "email") if t]

    @property
    def authors(self) -> list[dict]:
        out = []
        for group in self._author_groups():
            for a in group.findall("author"):
                out.append({
                    "full_name": self.get_author_name(a),
                    "raw_affiliations":
                        self.get_author_affiliations(a, group),
                    "emails": self.get_author_emails(a)})
        return out

    # -- references ---------------------------------------------------

    # explicit prefixes mirror the reference xpaths (elsevier.py:616-634):
    # './title/maintitle' is the work's own title; './/series/title/
    # maintitle' the journal — a bare './/title' would conflate them
    _REF_FIELDS = (
        (".//series/title/maintitle", "journal_title"),
        ("./publisher/name", "publisher"),
        (".//volume-nr", "journal_volume"),
        (".//issue-nr", "journal_issue"),
        (".//date", "year"),
        (".//inter-ref", "url"),
        (".//doi", "doi"),
        ("./title/maintitle", "title"),
    )

    @staticmethod
    def _ref_people(citation: ET.Element, container: str) -> list[str]:
        """authors ('contribution/authors') or editors ('.//editors')."""
        if container == "authors":
            nodes = citation.findall("./contribution/authors/author")
        else:
            nodes = [a for e in citation.iter("editors")
                     for a in e.findall("./authors/author")]
        out = []
        for a in nodes:
            given = _findtext(a, "given-name") or ""
            last = _findtext(a, "surname") or ""
            name = f"{given} {last}".strip()
            if name:
                out.append(name)
        return out

    def references_iter(self, ref_node: ET.Element):
        label = (_findtext(ref_node, "label") or "").strip("[]")
        for citation in list(ref_node.findall("reference")) + \
                list(ref_node.findall("other-ref")):
            ref: dict = {"label": label or None,
                         "raw_ref": None, "source": self.source}
            raw = _text(citation)
            ref["raw_ref"] = raw.strip() if raw else None
            for path, key in self._REF_FIELDS:
                ref[key] = _findtext(citation, path) or None
            artid = _findtext(citation, ".//article-number")
            first = _findtext(citation, ".//pages/first-page")
            last = _findtext(citation, ".//pages/last-page")
            if artid:
                ref["artid"] = artid
            if first or last:
                ref["page_start"], ref["page_end"] = first, last
            ref["editors"] = self._ref_people(citation, "editors")
            ref["authors"] = self._ref_people(citation, "authors")
            yield ref

    @property
    def references(self) -> list[dict]:
        out = []
        for node in self.root.iter("bib-reference"):
            out.extend(self.references_iter(node))
        return out

    # -- predicates ---------------------------------------------------

    def should_record_be_harvested(self) -> bool:
        return bool(
            self.article_type in DOCTYPES_TO_HARVEST
            and self.title and self.journal_title and self.journal_volume
            and (self.artid or self.page_start))


def parse_elsevier(xml_str: str, source: str | None = None) -> dict:
    """One Elsevier record -> flat record dict (error-row contract)."""
    try:
        p = ElsevierRecordParser(xml_str, source=source)
        return {
            "title": p.title, "subtitle": p.subtitle,
            "abstract": p.abstract,
            "article_type": p.article_type,
            "document_type": p.document_type,
            "material": p.material,
            "journal_title": p.journal_title,
            "journal_issue": p.journal_issue,
            "journal_volume": p.journal_volume,
            "artid": p.artid,
            "page_start": p.page_start, "page_end": p.page_end,
            "year": p.year,
            "imprints_date": p.imprints_date,
            "publication_date": p.publication_date,
            "dois": p.dois,
            "copyright": p.copyright,
            "license": p.license,
            "keywords": p.keywords,
            "collaborations": p.collaborations,
            "authors": p.authors,
            "references": p.references,
            "publisher": p.publisher,
            "harvest": p.should_record_be_harvested(),
            "error": None,
        }
    except ET.ParseError as exc:
        return {"title": None, "subtitle": None, "abstract": None,
                "article_type": None, "document_type": None,
                "material": None, "journal_title": None,
                "journal_issue": None, "journal_volume": None,
                "artid": None, "page_start": None, "page_end": None,
                "year": None, "imprints_date": None,
                "publication_date": None, "dois": [], "copyright": {},
                "license": {}, "keywords": [], "collaborations": [],
                "authors": [], "references": [], "publisher": None,
                "harvest": False, "error": f"bad elsevier record: {exc}"}
