"""JATS-shaped XML record parser — the structured-record depth layer.

Reimplements (from public behavior, stdlib ElementTree, no lxml/Scrapy)
the hallmark behaviors of the reference's JATS parser
(reference: hepcrawl/parsers/jats.py):

- nested author extraction from ``<contrib contrib-type="author">``
  nodes (jats.py:126-130, 510-530)
- affiliation resolution through ``<xref ref-type="aff" rid=...>``
  id-joins against ``<aff id=...>`` nodes, including multi-id rids
  like ``rid="aff1 aff2"`` (jats.py:338-399)
- ORCID normalization: URL / "orcid:" prefixes stripped, bare 16-char
  ids re-dashed, uppercase checksum X (jats.py:523-537 via
  idutils.normalize_orcid)
- author emails from the contrib node AND from referred aff nodes
  (jats.py:354-364, 411-418)
- reference extraction from ``./back/ref-list/ref/mixed-citation``:
  journal source, volume, issue, year, DOI / arXiv ids, title, label
  (stripped of "[].") and page-range start/artid split
  (jats.py:554-639)
- min-over-date-nodes publication date, ignoring electronic/online
  pub-dates (jats.py:366-385)
- collaborations from ``<collab>`` / on-behalf-of nodes
  (jats.py:133-143)

Every function is pure (record string -> dict) so it drops into
``map_batches`` batch UDFs; errors become error rows, not exceptions.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

_ORCID_PREFIX_RE = re.compile(
    r"^(?:https?://(?:www\.)?orcid\.org/|orcid:?\s*)", re.I)
_ORCID_BARE_RE = re.compile(r"^[0-9]{15}[0-9Xx]$")
_ORCID_DASHED_RE = re.compile(r"^[0-9]{4}-[0-9]{4}-[0-9]{4}-[0-9]{3}[0-9Xx]$")


def normalize_orcid(value: str | None) -> str | None:
    """ORCID -> canonical dashed form (analog of idutils.normalize_orcid
    as used at reference: hepcrawl/parsers/jats.py:533-537)."""
    if not value:
        return None
    v = _ORCID_PREFIX_RE.sub("", value.strip()).strip("/")
    v = v.replace(" ", "")
    if _ORCID_BARE_RE.match(v):
        v = "-".join([v[0:4], v[4:8], v[8:12], v[12:16]])
    if not _ORCID_DASHED_RE.match(v):
        return None
    return v.upper()


def split_page_artid(page_range: str | None):
    """'23-47' -> (23, 47, None); a lone token is an artid
    (analog: hepcrawl/utils.py split_page_artid semantics used at
    parsers/jats.py:631-634)."""
    if not page_range:
        return None, None, None
    parts = page_range.split("-", 1)
    if len(parts) == 2 and parts[0].strip().isdigit() \
            and parts[1].strip().isdigit():
        return parts[0].strip(), parts[1].strip(), None
    return None, None, page_range.strip()


def _node_text(el) -> str:
    """All descendant text, whitespace-collapsed."""
    return " ".join("".join(el.itertext()).split())


class JatsRecordParser:
    """One JATS-ish document -> structured record pieces.

    Built per record inside a batch UDF; the ElementTree parse is the
    only state.  All lookups (aff by id) are row-local hash joins,
    exactly the reference's shape (reference:
    hepcrawl/parsers/jats.py:338-352 + utils.py:210-217 build_dict).
    """

    def __init__(self, xml_str: str):
        self.root = ET.fromstring(xml_str)
        # row-local id->aff node index (the "affiliation-by-id join")
        self._affs = {a.get("id"): a for a in self.root.iter("aff")
                      if a.get("id")}

    # ---------------------------------------------------- affiliations ----

    def get_affiliation(self, id_: str) -> str | None:
        """Affiliation text for one id, labels/emails stripped
        (reference: jats.py:338-352)."""
        node = self._affs.get(id_)
        if node is None:
            return None
        parts = []
        if node.text and node.text.strip():
            parts.append(node.text)
        for child in node:
            if child.tag not in ("label", "email"):
                parts.append(_node_text(child))
            if child.tail and child.tail.strip():
                parts.append(child.tail)
        out = " ".join(" ".join(parts).split())
        return out or None

    def get_emails_from_refs(self, id_: str) -> list[str]:
        node = self._affs.get(id_)
        if node is None:
            return []
        return [e.text.strip() for e in node.iter("email")
                if e.text and e.text.strip()]

    def get_author_affiliations(self, contrib) -> list[str]:
        """Resolve xref rids (possibly multi-id: 'a1 a2') to aff texts
        (reference: jats.py:385-399).  Order = document order of the
        xrefs, deduped (the reference uses a set; we keep a
        deterministic first-seen order so outputs are stable)."""
        seen, out = set(), []
        for xref in contrib.iter("xref"):
            if xref.get("ref-type") != "aff":
                continue
            for rid in (xref.get("rid") or "").split():
                if rid in seen:
                    continue
                seen.add(rid)
                aff = self.get_affiliation(rid)
                if aff:
                    out.append(aff)
        return out

    # --------------------------------------------------------- authors ----

    def get_author(self, contrib) -> dict:
        name_el = contrib.find("string-name")
        if name_el is None:
            name_el = contrib.find("name")
        if name_el is not None and name_el.tag == "name":
            surname = name_el.findtext("surname", "").strip()
            given = name_el.findtext("given-names", "").strip()
            full = ", ".join(p for p in (surname, given) if p)
        else:
            full = _node_text(name_el) if name_el is not None else ""
        orcid = None
        for cid in contrib.iter("contrib-id"):
            if cid.get("contrib-id-type") == "orcid":
                orcid = normalize_orcid(cid.text)
                break
        emails = [e.text.strip() for e in contrib.iter("email")
                  if e.text and e.text.strip()]
        # dedup referred rids exactly like the affiliation resolution —
        # a rid repeated across xrefs must not duplicate its emails
        seen_rids = set()
        for xref in contrib.iter("xref"):
            if xref.get("ref-type") == "aff":
                for rid in (xref.get("rid") or "").split():
                    if rid in seen_rids:
                        continue
                    seen_rids.add(rid)
                    emails.extend(self.get_emails_from_refs(rid))
        return {
            "full_name": full or None,
            "orcid": orcid,
            "affiliations": self.get_author_affiliations(contrib),
            "emails": emails,
        }

    @property
    def authors(self) -> list[dict]:
        return [self.get_author(c) for c in self.root.iter("contrib")
                if c.get("contrib-type") == "author"]

    @property
    def collaborations(self) -> list[str]:
        out = []
        for c in self.root.iter("collab"):
            t = _node_text(c)
            if t and t not in out:
                out.append(t)
        for c in self.root.iter("on-behalf-of"):
            t = _node_text(c)
            if t and t not in out:
                out.append(t)
        return out

    # ----------------------------------------------------------- dates ----

    @property
    def publication_date(self) -> str | None:
        """Earliest non-electronic pub date, ISO (reference min-over-
        date-nodes selection, jats.py:366-385 + 291-304)."""
        best = None
        for node in self.root.iter("pub-date"):
            fmt = (node.get("publication-format") or "").lower()
            ptype = (node.get("pub-type") or node.get("date-type") or "").lower()
            if fmt.startswith(("elec", "online")):
                continue
            if ptype and not ptype.startswith(("ppub", "pub")):
                continue
            y = node.findtext("year")
            if not y or not y.strip().isdigit():
                continue
            m = node.findtext("month") or "1"
            d = node.findtext("day") or "1"
            try:
                key = (int(y), int(m), int(d))
            except ValueError:
                key = (int(y), 1, 1)
            if best is None or key < best:
                best = key
        if best is None:
            return None
        return f"{best[0]:04d}-{best[1]:02d}-{best[2]:02d}"

    # ------------------------------------------------------ references ----

    def get_reference(self, ref_node) -> list[dict]:
        """One <ref> -> parsed reference dicts, one per mixed-citation
        (reference: jats.py:554-639)."""
        label = (ref_node.findtext("label") or "").strip("[]. ") or None
        out = []
        for cit in ref_node.iter("mixed-citation"):
            pub_type = cit.get("publication-type") or ""
            journal_title = None
            parent_title = None
            src = cit.findtext("source")
            if src:
                if pub_type in ("journal", "eprint"):
                    journal_title = src.strip()
                elif pub_type == "book":
                    parent_title = src.strip()
            doi = arxiv = None
            for pid in cit.iter("pub-id"):
                if pid.get("pub-id-type") == "doi" and pid.text:
                    doi = pid.text.strip()
                elif pid.get("pub-id-type") == "arxiv" and pid.text:
                    arxiv = pid.text.strip()
            ref_authors, ref_editors = [], []
            for pg in cit.iter("person-group"):
                role = pg.get("person-group-type")
                names = [_node_text(n) for n in pg.iter("string-name")]
                if role == "author":
                    ref_authors.extend(n for n in names if n)
                elif role == "editor":
                    ref_editors.extend(n for n in names if n)
            page_start, page_end, artid = split_page_artid(
                cit.findtext("page-range"))
            year = (cit.findtext("year") or "").strip() or None
            out.append({
                "label": label,
                "journal_title": journal_title,
                "parent_title": parent_title,
                "publisher": (cit.findtext("publisher-name") or "").strip() or None,
                "volume": (cit.findtext("volume") or "").strip() or None,
                "issue": (cit.findtext("issue") or "").strip() or None,
                "year": int(year) if year and year.isdigit() else None,
                "doi": doi,
                "arxiv": arxiv,
                "title": (cit.findtext("article-title") or "").strip() or None,
                "authors": ref_authors,
                "editors": ref_editors,
                "page_start": page_start,
                "page_end": page_end,
                "artid": artid,
            })
        return out

    @property
    def references(self) -> list[dict]:
        ref_list = self.root.find("./back/ref-list")
        if ref_list is None:
            return []
        out = []
        for ref in ref_list.iter("ref"):
            out.extend(self.get_reference(ref))
        return out

    # ------------------------------------------------------ whole record ----

    @property
    def title(self) -> str | None:
        el = self.root.find(".//article-title")
        return _node_text(el) if el is not None else None

    @property
    def abstract(self) -> str | None:
        el = self.root.find(".//abstract")
        return _node_text(el) if el is not None else None

    @property
    def dois(self) -> list[str]:
        out = []
        for el in self.root.iter("article-id"):
            if el.get("pub-id-type") == "doi" and el.text:
                out.append(el.text.strip())
        return out

    @property
    def keywords(self) -> tuple[list[str], list[str]]:
        """(free_keywords, classification_numbers) from kwd-groups: a
        group typed "pacs" holds classification numbers, every other
        group holds free keywords (reference:
        hepcrawl/extractors/jats.py:58-69)."""
        free, pacs = [], []
        for group in self.root.iter("kwd-group"):
            target = pacs if (group.get("kwd-group-type") or "") \
                .lower() == "pacs" else free
            for kwd in group.iter("kwd"):
                t = _node_text(kwd)
                if t:
                    target.append(t)
        return free, pacs

    def parse(self) -> dict:
        free_keywords, classification_numbers = self.keywords
        return {
            "title": self.title,
            "abstract": self.abstract,
            "authors": self.authors,
            "collaborations": self.collaborations,
            "dois": self.dois,
            "date_published": self.publication_date,
            "references": self.references,
            "free_keywords": free_keywords,
            "classification_numbers": classification_numbers,
            "error": None,
        }


def parse_jats(xml_str: str) -> dict:
    """Pure record parse with the error-row contract
    (reference: hepcrawl/utils.py:492-502 error ParsedItem)."""
    try:
        return JatsRecordParser(xml_str).parse()
    except ET.ParseError as exc:
        return {"title": None, "abstract": None, "authors": [],
                "collaborations": [], "dois": [], "date_published": None,
                "references": [], "free_keywords": [],
                "classification_numbers": [],
                "error": f"bad jats record: {exc}"}
