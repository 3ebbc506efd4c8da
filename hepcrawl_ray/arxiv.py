"""arXiv record parser — classification richness layer.

Reimplements (public behavior, stdlib ElementTree) the hallmark
behaviors of the reference's arXiv parser
(reference: hepcrawl/parsers/arxiv.py:99-403):

- page-count regex over the comments field (arxiv.py:44, 289-297)
- thesis / conference-paper classification by word-boundary keyword
  match (arxiv.py:32-43, 376-386 + mappings.py:14-71)
- category normalization (obsolete arXiv categories -> modern form)
  with order-preserving dedup (arxiv.py:369-374)
- DOI splitting on the lookahead regex (arxiv.py:46, multiple DOIs in
  one <doi> node)
- report-number splitting on ', ' (arxiv.py:357-364)
- author/collaboration heuristics: collaboration phrases in the name
  or (non-institute) affiliation fields, ``for the X`` extraction, the
  lone-':' name warning (arxiv.py:131-215)
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

from hepcrawl_ray.functions import coll_cleanforthe, split_fullname

# word lists are public arXiv/INSPIRE conventions
# (reference: hepcrawl/mappings.py:14-71)
CONFERENCE_WORDS = [
    "colloquium", "colloquiums", "conf", "conference", "conferences",
    "contrib", "contributed", "contribution", "contributions", "forum",
    "lecture", "lectures", "meeting", "meetings", "pres", "presented",
    "proc", "proceeding", "proceedings", "rencontre", "rencontres",
    "school", "schools", "seminar", "seminars", "symp", "symposium",
    "symposiums", "talk", "talks", "workshop", "workshops",
]
THESIS_WORDS = [
    "diploma", "diplomarbeit", "diplome", "dissertation", "doctoraal",
    "doctoral", "doctorat", "doctorate", "doktorarbeit", "dottorato",
    "habilitationsschrift", "hochschule", "inauguraldissertation",
    "memoire", "phd", "proefschrift", "schlussbericht",
    "staatsexamensarbeit", "tesi", "thesis", "travail",
]

RE_CONFERENCE = re.compile(
    r"\b(%s)\b" % "|".join(re.escape(w) for w in CONFERENCE_WORDS),
    re.I | re.U)
RE_THESIS = re.compile(
    r"\b(%s)\b" % "|".join(re.escape(w) for w in THESIS_WORDS),
    re.I | re.U)
RE_PAGES = re.compile(r"(?i)(\d+)\s*pages?\b")
RE_DOIS = re.compile(r"[,;\s]+(?=\s*10[.]\d{4,})")

# obsolete arXiv category -> modern form (public arXiv taxonomy)
OBSOLETE_CATEGORIES = {
    "acc-phys": "physics.acc-ph", "adap-org": "nlin.AO",
    "alg-geom": "math.AG", "ao-sci": "physics.ao-ph",
    "atom-ph": "physics.atom-ph", "bayes-an": "physics.data-an",
    "chao-dyn": "nlin.CD", "chem-ph": "physics.chem-ph",
    "cmp-lg": "cs.CL", "comp-gas": "nlin.CG", "dg-ga": "math.DG",
    "funct-an": "math.FA", "mtrl-th": "cond-mat.mtrl-sci",
    "patt-sol": "nlin.PS", "plasm-ph": "physics.plasm-ph",
    "q-alg": "math.QA", "solv-int": "nlin.SI",
    "supr-con": "cond-mat.supr-con",
}

_COLLAB_PHRASES = ["consortium", " collab ", "collaboration", " team",
                   "group", " on behalf of ", " representing "]
_INST_PHRASES = ["institute", "university", "department", "center"]


def normalize_arxiv_category(cat: str) -> str:
    """Obsolete category -> modern form; modern categories unchanged."""
    return OBSOLETE_CATEGORIES.get(cat.strip(), cat.strip())


def dedupe_list(items) -> list:
    """Order-preserving dedup (reference: inspire_utils.dedupers)."""
    seen, out = set(), []
    for x in items:
        if x not in seen:
            seen.add(x)
            out.append(x)
    return out


def number_of_pages(comments: str) -> int | None:
    """'..., 12 pages, ...' -> 12 (reference: arxiv.py:289-297)."""
    m = RE_PAGES.search(comments or "")
    return int(m.group(1)) if m else None


def classify_document_type(comments: str) -> str:
    """thesis > conference paper > article, keyed on word-boundary
    keyword hits in the comments (reference: arxiv.py:376-386)."""
    comments = comments or ""
    if RE_THESIS.search(comments):
        return "thesis"
    if RE_CONFERENCE.search(comments):
        return "conference paper"
    return "article"


def split_dois(text: str) -> list[str]:
    """Multiple DOIs in one field, split at the 10.xxxx lookahead
    (reference: arxiv.py:46)."""
    return [d.strip() for d in RE_DOIS.split(text or "") if d.strip()]


def split_report_numbers(values) -> list[str]:
    """Each <report-no> may pack several numbers comma-joined
    (reference: arxiv.py:357-364)."""
    out = []
    for v in values:
        out.extend(p for p in (s.strip() for s in v.split(", ")) if p)
    return out


def authors_and_collaborations(author_rows):
    """The reference's collaboration heuristics over (forenames,
    keyname, affiliations[]) rows (reference: arxiv.py:131-215).

    Returns (authors, collaborations, warning): a collaboration can
    hide in the author name (``X for the Y Collaboration``, or a name
    containing a collab phrase) or in a non-institute affiliation; a
    lone ':' name flags the NEXT name for manual review.
    """
    authors, collaborations, warning_tags = [], [], []
    some_affiliation_contains_collaboration = False

    rows = list(author_rows)
    for i, (forenames, keyname, affiliations) in enumerate(rows):
        nxt = rows[i + 1] if i + 1 < len(rows) else ("end of author-list", "")
        name_string = f" {forenames} {keyname} "

        affs_with_coll, affs_without_coll = [], []
        for aff in affiliations:
            low = aff.lower()
            has_coll = (any(p in low for p in _COLLAB_PHRASES)
                        and not any(p in low for p in _INST_PHRASES))
            if has_coll:
                affs_with_coll.append(aff)
                some_affiliation_contains_collaboration = True
            else:
                affs_without_coll.append(aff)
        for aff in affs_with_coll:
            coll, _ = coll_cleanforthe(aff)
            if coll and coll not in collaborations:
                collaborations.append(coll)

        low_name = name_string.lower()
        collaboration_in_name = (" for the " in low_name
                                 or any(p in low_name for p in _COLLAB_PHRASES))
        if collaboration_in_name:
            coll, author_name = coll_cleanforthe(name_string)
            if author_name:
                surname, given_names = split_fullname(author_name)
                authors.append({"full_name": f"{surname}, {given_names}",
                                "surname": surname,
                                "given_names": given_names,
                                "affiliations": []})
            if coll and coll not in collaborations:
                collaborations.append(coll)
        elif name_string.strip() == ":":
            warning_tags.append(f" {nxt[0]} {nxt[1]} ")
        else:
            surname = keyname or ""
            given_names = forenames or ""
            full = ", ".join(p for p in (surname, given_names) if p)
            authors.append({"full_name": full, "surname": surname,
                            "given_names": given_names,
                            "affiliations": [{"value": a}
                                             for a in affs_without_coll]})
    warning = ("collaboration warning: %s" % "; ".join(warning_tags)
               if warning_tags and not some_affiliation_contains_collaboration
               else None)
    return authors, collaborations, warning


class ArxivRecordParser:
    """One arXiv-ish record (``<article>`` with id/title/abstract/
    categories/comments/journal-ref/report-no/doi/authors children)."""

    def __init__(self, xml_str: str):
        self.root = ET.fromstring(xml_str)

    def _text(self, tag: str) -> str | None:
        el = self.root.find(f".//{tag}")
        return el.text if el is not None and el.text else None

    @property
    def comments(self) -> str:
        return "; ".join(e.text for e in self.root.iter("comments") if e.text)

    @property
    def arxiv_eprint(self) -> str | None:
        return self._text("id")

    @property
    def arxiv_categories(self) -> list[str]:
        cats = (self._text("categories") or "").split()
        return dedupe_list(normalize_arxiv_category(c) for c in cats)

    @property
    def dois(self) -> list[str]:
        return split_dois(self._text("doi") or "")

    @property
    def report_numbers(self) -> list[str]:
        return split_report_numbers(
            e.text for e in self.root.iter("report-no") if e.text)

    @property
    def title(self) -> str | None:
        t = self._text("title")
        return re.sub(r"\s+", " ", t).strip() if t else None

    def _author_rows(self):
        for a in self.root.iter("author"):
            keyname = a.findtext("keyname", "")
            forenames = a.findtext("forenames", "")
            affs = [e.text for e in a.iter("affiliation") if e.text]
            yield forenames, keyname, affs

    def parse(self) -> dict:
        authors, collabs, warning = authors_and_collaborations(
            self._author_rows())
        return {
            "title": self.title,
            "abstract": self._text("abstract"),
            "arxiv_eprint": self.arxiv_eprint,
            "arxiv_categories": self.arxiv_categories,
            "dois": self.dois,
            "report_numbers": self.report_numbers,
            "number_of_pages": number_of_pages(self.comments),
            "document_type": classify_document_type(self.comments),
            "journal_ref": self._text("journal-ref"),
            "authors": authors,
            "collaborations": collabs,
            "warning": warning,
            "error": None,
        }


def parse_arxiv(xml_str: str) -> dict:
    try:
        return ArxivRecordParser(xml_str).parse()
    except ET.ParseError as exc:
        return {"title": None, "abstract": None, "arxiv_eprint": None,
                "arxiv_categories": [], "dois": [], "report_numbers": [],
                "number_of_pages": None, "document_type": None,
                "journal_ref": None, "authors": [], "collaborations": [],
                "warning": None, "error": f"bad arxiv record: {exc}"}
