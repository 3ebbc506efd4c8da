"""Concrete ``Source`` definitions, part 2 — the remaining reference
spiders, each wired through the same seed/stages/identifier runner as
:mod:`hepcrawl_ray.sources.definitions` (§2.11):

- :func:`cds_source`       paged OAI MARCXML harvest -> collection-
  keyed doctype map (cds_spider.py:30-62)
- :func:`hindawi_source`   OAI ListRecords feed -> per-record MARC
  parse with the envelope fields (hindawi_spider.py:34-239)
- :func:`crossref_source`  cursor-paged REST JSON -> parse_crossref
  (crossref_spider.py:23-70)
- :func:`elsevier_source`  zip listing -> unzip -> parse -> harvest
  predicate (elsevier_spider.py + parsers/elsevier.py:686-696)
- :func:`iop_source`       NLM ArticleSet files -> per-Article parse
  with the pub-status drop QUARANTINED as flagged rows
  (iop_spider.py:110-185)
- :func:`pos_source`       two-hop scrape: pex-dc record -> paper page
  -> pdf link -> conference-paper item (pos_spider.py:131-345)
- :func:`edp_source`       tar packages of mixed 'jats'/'rich' XML ->
  format-dispatched parse (edp_spider.py:120-615)
- :func:`aps_source`       Link-next paged JSON with a per-DOI
  fallback parse, errors-as-rows (aps_spider.py:88-134)

Every fixture is a pure function of ``doc_id`` so the matching
``source_*_harvest`` query has an exact DuckDB oracle.
"""

from __future__ import annotations

import io
import json
import tarfile
import zipfile
import xml.etree.ElementTree as ET

import pyarrow as pa
import pyarrow.compute as pc

from hepcrawl_ray.sources.definitions import (
    SOURCES,
    Source,
    _docs_rows,
)


def _paged_seed(sf_dir: str, page_size: int = 50) -> pa.Table:
    """Resumption-link paged id walk (shared by CDS / Crossref / APS;
    reference: oaipmh_spider.py:121-152's ListRecords token chain)."""
    from hepcrawl_ray.sources.paged import follow_linked_pages

    ids = _docs_rows(sf_dir, ("doc_id",)).column("doc_id").to_pylist()
    pages = {f"p{i}": ids[i * page_size:(i + 1) * page_size]
             for i in range((len(ids) + page_size - 1) // page_size)}

    def fetch_page(key):
        k = int(key[1:])
        nxt = f"p{k + 1}" if f"p{k + 1}" in pages else None
        return pages[key], nxt

    payloads = follow_linked_pages(fetch_page, "p0" if pages else None)
    page_ids, doc_ids = [], []
    for i, page in enumerate(payloads):
        page_ids.extend([f"p{i}"] * len(page))
        doc_ids.extend(page)
    return pa.table({"package_id": pa.array(page_ids, pa.string()),
                     "doc_id": pa.array(doc_ids, pa.int64())})


def _grouped_seed(sf_dir: str, build) -> pa.Table:
    """One package per documents ``source`` value, payload built by
    ``build(source, [doc_id, ...]) -> bytes|str`` (the FTP-listing /
    file-set fixture shape shared by Hindawi / Elsevier / IOP / EDP)."""
    docs = _docs_rows(sf_dir, ("doc_id", "source"))
    pkgs: dict[str, list[int]] = {}
    for did, src in zip(docs.column("doc_id").to_pylist(),
                        docs.column("source").to_pylist()):
        pkgs.setdefault(src, []).append(did)
    names = sorted(pkgs)
    payloads = [build(s, pkgs[s]) for s in names]
    col = (pa.array(payloads, pa.binary())
           if payloads and isinstance(payloads[0], bytes)
           else pa.array(payloads, pa.string()))
    return pa.table({"package_id": pa.array(names, pa.string()),
                     "blob": col})


# ---------------------------------------------------------------------------
# CDS: paged OAI MARCXML -> collection-keyed doctype map
# ---------------------------------------------------------------------------

_CDS_COLLECTIONS = ("THESIS", "ConferencePaper", "HEP", "Book")


def _cds_marcxml(doc_id: int) -> str:
    coll = _CDS_COLLECTIONS[doc_id % 4]
    return (
        '<record xmlns="http://www.loc.gov/MARC21/slim">'
        f'<controlfield tag="001">cds{doc_id}</controlfield>'
        '<datafield tag="245" ind1=" " ind2=" ">'
        f'<subfield code="a">CDS {doc_id}</subfield></datafield>'
        '<datafield tag="260" ind1=" " ind2=" ">'
        f'<subfield code="c">{1990 + doc_id % 30}</subfield></datafield>'
        '<datafield tag="024" ind1="7" ind2=" ">'
        '<subfield code="2">DOI</subfield>'
        f'<subfield code="a">10.17/cds.{doc_id}</subfield></datafield>'
        '<datafield tag="980" ind1=" " ind2=" ">'
        f'<subfield code="a">{coll}</subfield></datafield>'
        '</record>')


def _cds_parse(t: pa.Table) -> pa.Table:
    """Fetch+parse each listed record (reference: cds_spider.py:30-62
    drives OAI GetRecord MARCXML through the marc->hep map)."""
    from hepcrawl_ray.marc import marcxml_to_record

    dids = t.column("doc_id").to_pylist()
    cols = {k: [] for k in ("recid", "title", "document_type",
                            "date_published", "doi")}
    for d in dids:
        rec = marcxml_to_record(_cds_marcxml(d))
        cols["recid"].append(rec["record_id"])
        cols["title"].append(rec["title"])
        cols["document_type"].append(rec["document_type"])
        cols["date_published"].append(rec["date_published"])
        cols["doi"].append(rec["dois"][0] if rec["dois"] else None)
    return pa.table({
        "package_id": t.column("package_id"),
        "doc_id": pa.array(dids, pa.int64()),
        **{k: pa.array(v, pa.string()) for k, v in cols.items()}})


def cds_source() -> Source:
    return Source(
        name="CDS",
        seed=_paged_seed,
        stages=(_cds_parse,),
        identifier=lambda t: t.column("recid"),
    )


# ---------------------------------------------------------------------------
# Hindawi: OAI ListRecords feed -> MARC parse with envelope fields
# ---------------------------------------------------------------------------

def _hindawi_record_xml(doc_id: int) -> str:
    lic = "CC-BY-3.0" if doc_id % 2 == 0 else "CC-BY-4.0"
    return (
        "<record>"
        f'<controlfield tag="001">hin{doc_id}</controlfield>'
        '<datafield tag="245" ind1=" " ind2=" ">'
        f'<subfield code="a">Hindawi {doc_id}</subfield></datafield>'
        '<datafield tag="300" ind1=" " ind2=" ">'
        f'<subfield code="a">{doc_id % 40 + 1}</subfield></datafield>'
        '<datafield tag="260" ind1=" " ind2=" ">'
        '<subfield code="b">Hindawi Publishing Corporation</subfield>'
        '</datafield>'
        '<datafield tag="540" ind1=" " ind2=" ">'
        f'<subfield code="a">{lic}</subfield></datafield>'
        '<datafield tag="024" ind1="7" ind2=" ">'
        '<subfield code="2">DOI</subfield>'
        f'<subfield code="a">10.1155/synth.{doc_id}</subfield>'
        '</datafield>'
        '<datafield tag="980" ind1=" " ind2=" ">'
        '<subfield code="a">HEP</subfield></datafield>'
        "</record>")


def _hindawi_seed(sf_dir: str) -> pa.Table:
    """One OAI ListRecords feed per documents source."""
    return _grouped_seed(sf_dir, lambda src, dids: (
        "<OAI-PMH><ListRecords>"
        + "".join(_hindawi_record_xml(d) for d in dids)
        + "</ListRecords></OAI-PMH>"))


def _hindawi_parse(t: pa.Table) -> pa.Table:
    """MARC parse each feed record (reference:
    hindawi_spider.py:169-239 — page_nr from 300$a, publisher source
    from 260$b, license from 540$a)."""
    from hepcrawl_ray.marc import marcxml_to_record

    cols = {k: [] for k in ("doc_id", "title", "page_nr", "publisher",
                            "license", "doi")}
    for xml in t.column("record_xml").to_pylist():
        rec = marcxml_to_record(xml)
        cols["doc_id"].append(int(rec["record_id"][3:]))
        cols["title"].append(rec["title"])
        cols["page_nr"].append(rec["page_nr"][0] if rec["page_nr"]
                               else None)
        cols["publisher"].append(rec["source"])
        cols["license"].append(rec["license"])
        cols["doi"].append(rec["dois"][0] if rec["dois"] else None)
    return pa.table({
        "package_id": t.column("package_id"),
        "doc_id": pa.array(cols["doc_id"], pa.int64()),
        **{k: pa.array(v, pa.string()) for k, v in cols.items()
           if k != "doc_id"}})


def hindawi_source() -> Source:
    from hepcrawl_ray.sources.expand import expand_xml_feed

    def split_feed(t: pa.Table) -> pa.Table:
        return expand_xml_feed(t, xml_col="blob", id_col="package_id",
                               itertag="record")

    return Source(
        name="Hindawi",
        seed=_hindawi_seed,
        stages=(split_feed, _hindawi_parse),
        identifier=lambda t: t.column("doi"),
    )


# ---------------------------------------------------------------------------
# Crossref: cursor-paged REST JSON -> parse_crossref
# ---------------------------------------------------------------------------

def _crossref_envelope(doc_id: int) -> str:
    types = ("journal-article", "proceedings-article", "dissertation",
             "book-chapter")
    prefix = "Erratum: " if doc_id % 5 == 0 else ""
    refs = [{"DOI": f"10.2/r{i}", "year": "2001"}
            for i in range(doc_id % 4)]
    return json.dumps({"message": {
        "type": types[doc_id % 4],
        "title": [f"{prefix}CX {doc_id}"],
        "DOI": f"10.99/cx.{doc_id}",
        "container-title": [f"J.CX.{doc_id % 5}"],
        "issued": {"date-parts": [[2000 + doc_id % 20]]},
        "reference": refs,
        "source": "Crossref",
    }})


def _crossref_parse(t: pa.Table) -> pa.Table:
    """Per-work fetch+parse (reference: crossref_spider.py:23-70 pages
    the works endpoint by cursor; parsers/crossref.py maps the
    message)."""
    from hepcrawl_ray.crossref import parse_crossref

    dids = t.column("doc_id").to_pylist()
    cols = {k: [] for k in ("doi", "document_type", "material",
                            "journal_title", "year", "n_references")}
    for d in dids:
        rec = parse_crossref(_crossref_envelope(d))
        cols["doi"].append(rec["dois"][0]["doi"])
        cols["document_type"].append(rec["document_type"])
        cols["material"].append(rec["material"])
        cols["journal_title"].append(
            rec["publication_info"]["journal_title"])
        cols["year"].append(rec["publication_info"]["year"])
        cols["n_references"].append(len(rec["references"]))
    return pa.table({
        "package_id": t.column("package_id"),
        "doc_id": pa.array(dids, pa.int64()),
        "doi": pa.array(cols["doi"], pa.string()),
        "document_type": pa.array(cols["document_type"], pa.string()),
        "material": pa.array(cols["material"], pa.string()),
        "journal_title": pa.array(cols["journal_title"], pa.string()),
        "year": pa.array(cols["year"], pa.int64()),
        "n_references": pa.array(cols["n_references"], pa.int64())})


def crossref_source() -> Source:
    return Source(
        name="Crossref",
        seed=_paged_seed,
        stages=(_crossref_parse,),
        identifier=lambda t: t.column("doi"),
    )


# ---------------------------------------------------------------------------
# Elsevier: zip listing -> unzip -> parse -> harvest predicate
# ---------------------------------------------------------------------------

_ELS_ABBREVS = ("fla", "err", "edi")          # edi fails the predicate


def _elsevier_member_xml(doc_id: int) -> str:
    return (
        "<doc><RDF><Description>"
        f"<doi>10.1016/els.{doc_id}</doi>"
        "<publicationName>J Els</publicationName>"
        f"<volume>{doc_id % 50 + 1}</volume>"
        f"<coverDisplayDate>10 May {2015 + doc_id % 5}"
        "</coverDisplayDate>"
        "<issueName>Regular issue</issueName>"
        "</Description></RDF>"
        f'<article docsubtype="{_ELS_ABBREVS[doc_id % 3]}">'
        f"<item-info><jid>JE</jid><aid>a{doc_id}</aid></item-info>"
        f"<head><title>Els {doc_id}</title></head></article></doc>")


def _elsevier_seed(sf_dir: str) -> pa.Table:
    def build(src, dids):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            for d in dids:
                zf.writestr(f"els_{d}.xml", _elsevier_member_xml(d))
        return buf.getvalue()

    return _grouped_seed(sf_dir, build)


def _elsevier_parse(t: pa.Table) -> pa.Table:
    from hepcrawl_ray.elsevier import parse_elsevier

    cols = {k: [] for k in ("doc_id", "article_type", "title", "doi",
                            "journal_title", "year", "harvest")}
    for name, data in zip(t.column("member_name").to_pylist(),
                          t.column("member_bytes").to_pylist()):
        rec = parse_elsevier(data.decode())
        cols["doc_id"].append(int(name[4:-4]))
        cols["article_type"].append(rec["article_type"])
        cols["title"].append(rec["title"])
        cols["doi"].append(rec["dois"][0]["doi"] if rec["dois"] else None)
        cols["journal_title"].append(rec["journal_title"])
        cols["year"].append(rec["year"])
        cols["harvest"].append(bool(rec["harvest"]))
    return pa.table({
        "package_id": t.column("package_id"),
        "doc_id": pa.array(cols["doc_id"], pa.int64()),
        "article_type": pa.array(cols["article_type"], pa.string()),
        "title": pa.array(cols["title"], pa.string()),
        "doi": pa.array(cols["doi"], pa.string()),
        "journal_title": pa.array(cols["journal_title"], pa.string()),
        "year": pa.array(cols["year"], pa.int64()),
        "harvest": pa.array(cols["harvest"], pa.bool_())})


def _elsevier_filter(t: pa.Table) -> pa.Table:
    """The harvest predicate gate (reference: elsevier.py:686-696)."""
    return t.filter(t.column("harvest"))


def elsevier_source() -> Source:
    from hepcrawl_ray.sources.expand import expand_zip

    def unzip(t: pa.Table) -> pa.Table:
        return expand_zip(t, suffix=".xml")

    return Source(
        name="Elsevier",
        seed=_elsevier_seed,
        stages=(unzip, _elsevier_parse, _elsevier_filter),
        identifier=lambda t: t.column("doi"),
    )


# ---------------------------------------------------------------------------
# IOP: NLM ArticleSet files -> per-Article parse, pub-status drop
# quarantined as flagged rows
# ---------------------------------------------------------------------------

def _iop_article_xml(doc_id: int) -> str:
    status = ("aheadofprint" if doc_id % 6 == 3 else
              "epublish" if doc_id % 6 == 5 else "ppublish")
    doctype = "Review" if doc_id % 7 == 0 else "Journal Article"
    return (
        "<Article>"
        f"<Journal><PubDate PubStatus=\"{status}\">"
        f"<Year>{2012 + doc_id % 8}</Year>"
        f"<Month>{doc_id % 12 + 1:02d}</Month></PubDate></Journal>"
        f"<ArticleTitle>IOP {doc_id}</ArticleTitle>"
        f"<PublicationType>{doctype}</PublicationType>"
        "<ArticleIdList><ArticleId IdType=\"doi\">"
        f"10.88/iop.{doc_id}</ArticleId></ArticleIdList>"
        f"<FirstPage>{doc_id % 90 + 1}</FirstPage>"
        f"<LastPage>{doc_id % 90 + doc_id % 9 + 1}</LastPage>"
        "</Article>")


def _iop_seed(sf_dir: str) -> pa.Table:
    return _grouped_seed(sf_dir, lambda src, dids: (
        "<ArticleSet>"
        + "".join(_iop_article_xml(d) for d in dids)
        + "</ArticleSet>"))


def _iop_parse(t: pa.Table) -> pa.Table:
    """Parse each Article; rows whose pub status is in the reference's
    drop list (iop_spider.py:110-130) are QUARANTINED via ``dropped``
    rather than silently discarded — at 100 TB the drop audit is the
    difference between a rerun and a shrug."""
    from hepcrawl_ray.nlm import parse_nlm

    cols = {k: [] for k in ("doc_id", "title", "doi", "pub_status",
                            "doctype", "date_published", "page_nr",
                            "dropped")}
    for xml in t.column("record_xml").to_pylist():
        rec = parse_nlm(xml)
        doi = rec["dois"][0] if rec["dois"] else None
        cols["doc_id"].append(int(doi.rsplit(".", 1)[1]) if doi else None)
        cols["title"].append(rec["title"])
        cols["doi"].append(doi)
        cols["pub_status"].append(rec["pub_status"])
        cols["doctype"].append(rec["doctype"])
        cols["date_published"].append(rec["date_published"])
        cols["page_nr"].append(rec["page_nr"])
        cols["dropped"].append(bool(rec["dropped"]))
    return pa.table({
        "package_id": t.column("package_id"),
        "doc_id": pa.array(cols["doc_id"], pa.int64()),
        "title": pa.array(cols["title"], pa.string()),
        "doi": pa.array(cols["doi"], pa.string()),
        "pub_status": pa.array(cols["pub_status"], pa.string()),
        "doctype": pa.array(cols["doctype"], pa.string()),
        "date_published": pa.array(cols["date_published"], pa.string()),
        "page_nr": pa.array(cols["page_nr"], pa.string()),
        "dropped": pa.array(cols["dropped"], pa.bool_())})


def iop_source() -> Source:
    from hepcrawl_ray.sources.expand import expand_xml_feed

    def split_set(t: pa.Table) -> pa.Table:
        return expand_xml_feed(t, xml_col="blob", id_col="package_id",
                               itertag="Article")

    return Source(
        name="IOP",
        seed=_iop_seed,
        stages=(split_set, _iop_parse),
        identifier=lambda t: t.column("doi"),
    )


# ---------------------------------------------------------------------------
# PoS: two-hop scrape — pex-dc record -> paper page -> pdf -> item
# ---------------------------------------------------------------------------

def _pos_record_xml(doc_id: int) -> str:
    vol = f"SYN{doc_id % 12}"
    artid = f"{doc_id % 400:03d}"
    lang = "fr" if doc_id % 3 == 0 else "en"
    return (
        "<record><metadata><pex-dc>"
        f"<title>Talk {doc_id}</title>"
        f"<creator><name>Auth, {doc_id}</name></creator>"
        f"<date>2019-06-{doc_id % 28 + 1:02d}</date>"
        "<publisher>Sissa Medialab</publisher>"
        f"<identifier>PoS({vol}){artid}</identifier>"
        f"<language>{lang}</language>"
        "</pex-dc></metadata></record>")


def _pos_paper_page(doc_id: int) -> str:
    vol = f"SYN{doc_id % 12}"
    artid = f"{doc_id % 400:03d}"
    return (f'<html><a href="/archive/{doc_id}/{vol}_{artid}.pdf">pdf'
            "</a></html>")


def _pos_fetch_page(t: pa.Table) -> pa.Table:
    """Hop 1: fetch each contribution page and extract the pdf link
    (reference: pos_spider.py:186-199 scrape_conference_paper_page)."""
    from hepcrawl_ray.pos import get_conference_paper_pdf_url

    dids = t.column("doc_id").to_pylist()
    pdf = [get_conference_paper_pdf_url(
        _pos_paper_page(d), "https://pos.example.org/contribution")
        for d in dids]
    return pa.table({
        "package_id": t.column("package_id"),
        "doc_id": pa.array(dids, pa.int64()),
        "pdf_url": pa.array(pdf, pa.string())})


def _pos_build_items(t: pa.Table) -> pa.Table:
    """Hop 2: pex-dc record + urls -> conference-paper item
    (reference: pos_spider.py:201-264)."""
    from hepcrawl_ray.pos import build_conference_paper_item

    dids = t.column("doc_id").to_pylist()
    cols = {k: [] for k in ("journal_title", "journal_volume",
                            "journal_artid", "title", "language",
                            "pdf_key", "pos_id")}
    for d, pdf in zip(dids, t.column("pdf_url").to_pylist()):
        item = build_conference_paper_item(
            _pos_record_xml(d),
            f"https://pos.example.org/contribution?id={d}", pdf)
        cols["journal_title"].append(item["journal_title"])
        cols["journal_volume"].append(item["journal_volume"])
        cols["journal_artid"].append(item["journal_artid"])
        cols["title"].append(item["title"])
        cols["language"].append(item["language"])
        cols["pdf_key"].append(item["documents"][0]["key"])
        cols["pos_id"].append(
            item["external_system_numbers"][0]["value"])
    return pa.table({
        "package_id": t.column("package_id"),
        "doc_id": pa.array(dids, pa.int64()),
        **{k: pa.array(v, pa.string()) for k, v in cols.items()}})


def pos_source() -> Source:
    return Source(
        name="PoS",
        seed=_paged_seed,
        stages=(_pos_fetch_page, _pos_build_items),
        identifier=lambda t: t.column("pos_id"),
    )


# ---------------------------------------------------------------------------
# EDP: tar packages of mixed 'jats' / 'rich' XML -> format dispatch
# ---------------------------------------------------------------------------

def _edp_member_xml(doc_id: int) -> str:
    n_auth = doc_id % 3 + 1
    if doc_id % 2 == 0:                                     # jats
        at = "review-article" if doc_id % 5 == 0 else "research-article"
        conf = "<conference/>" if doc_id % 7 == 0 else ""
        contribs = "".join(
            f'<contrib contrib-type="author"><name>'
            f"<surname>S{doc_id}_{a}</surname>"
            f"<given-names>G{a}</given-names></name></contrib>"
            for a in range(n_auth))
        return (f'<article article-type="{at}">{conf}'
                f"<contrib-group>{contribs}</contrib-group></article>")
    authors = "".join(
        f"<Author><AuthorName><LastName>S{doc_id}_{a}</LastName>"
        f"<FirstName>G{a}</FirstName></AuthorName></Author>"
        for a in range(n_auth))
    return (f"<Article><Year>2013</Year>"
            f"<MonthNumber>{doc_id % 12 + 1}</MonthNumber>"
            f"{authors}</Article>")


def _edp_seed(sf_dir: str) -> pa.Table:
    def build(src, dids):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w:gz") as tf:
            for d in dids:
                data = _edp_member_xml(d).encode()
                info = tarfile.TarInfo(name=f"edp_{d}.xml")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
        return buf.getvalue()

    return _grouped_seed(sf_dir, build)


def _edp_parse(t: pa.Table) -> pa.Table:
    """Format dispatch on the root tag (reference: edp_spider.py:120-163
    routes '.xml' members to the rich parse and JATS members to the
    jats parse)."""
    from hepcrawl_ray import edp

    cols = {k: [] for k in ("doc_id", "fmt", "n_authors",
                            "date_published", "collections")}
    for name, data in zip(t.column("member_name").to_pylist(),
                          t.column("member_bytes").to_pylist()):
        d = int(name[4:-4])
        root = ET.fromstring(data.decode())
        if root.tag == "article":
            authors = edp.get_authors_jats(root)
            colls = edp.get_collections(
                root, root.get("article-type"), None)
            date = None
            fmt = "jats"
        else:
            authors = edp.get_authors_rich(root)
            colls = edp.get_collections(root, None, None)
            date = edp.get_date_published_rich(root)
            fmt = "rich"
        cols["doc_id"].append(d)
        cols["fmt"].append(fmt)
        cols["n_authors"].append(len(authors))
        cols["date_published"].append(date)
        cols["collections"].append(",".join(colls))
    return pa.table({
        "package_id": t.column("package_id"),
        "doc_id": pa.array(cols["doc_id"], pa.int64()),
        "fmt": pa.array(cols["fmt"], pa.string()),
        "n_authors": pa.array(cols["n_authors"], pa.int64()),
        "date_published": pa.array(cols["date_published"], pa.string()),
        "collections": pa.array(cols["collections"], pa.string())})


def edp_source() -> Source:
    from hepcrawl_ray.sources.expand import expand_tar

    def untar(t: pa.Table) -> pa.Table:
        return expand_tar(t, suffix=".xml")

    return Source(
        name="EDP",
        seed=_edp_seed,
        stages=(untar, _edp_parse),
        identifier=lambda t: pc.binary_join_element_wise(
            pa.array(["edp"] * t.num_rows, pa.string()),
            pc.cast(t.column("doc_id"), pa.string()), ":"),
    )


# ---------------------------------------------------------------------------
# APS: Link-next paged JSON with per-DOI fallback, errors as rows
# ---------------------------------------------------------------------------

def _aps_doc_id(doi: str) -> int:
    return int(doi.rsplit(".", 1)[1])


def _aps_primary(doi: str) -> dict:
    """REST JSON fetch; every 11th record 404s (reference:
    aps_spider.py:88-111 retries those through the per-DOI XML path)."""
    d = _aps_doc_id(doi)
    if d % 11 == 0:
        raise RuntimeError("synthetic 404")
    return {"title": f"APS {d}", "journal": "PRD",
            "year": 2005 + d % 15}


def _aps_fallback(doi: str) -> dict:
    d = _aps_doc_id(doi)
    return {"title": f"APS {d}", "journal": None,
            "year": 2005 + d % 15}


def _aps_fetch(t: pa.Table) -> pa.Table:
    from hepcrawl_ray.sources.paged import fetch_with_fallback

    dids = t.column("doc_id").to_pylist()
    batch = pa.table({
        "package_id": t.column("package_id"),
        "doc_id": t.column("doc_id"),
        "doi": pa.array([f"10.103/aps.{d}" for d in dids], pa.string())})
    out = fetch_with_fallback(batch, _aps_primary, _aps_fallback,
                              key_col="doi",
                              fields=("title", "journal", "year"))
    return pa.table({
        "package_id": batch.column("package_id"),
        "doc_id": batch.column("doc_id"),
        "doi": out.column("doi"),
        "title": pc.cast(out.column("title"), pa.string()),
        "journal": pc.cast(out.column("journal"), pa.string()),
        "year": pc.cast(out.column("year"), pa.int64()),
        "used_fallback": out.column("used_fallback")})


def aps_source() -> Source:
    return Source(
        name="APS",
        seed=_paged_seed,
        stages=(_aps_fetch,),
        identifier=lambda t: t.column("doi"),
    )


SOURCES.update({
    "CDS": cds_source,
    "Hindawi": hindawi_source,
    "Crossref": crossref_source,
    "Elsevier": elsevier_source,
    "IOP": iop_source,
    "PoS": pos_source,
    "EDP": edp_source,
    "APS": aps_source,
})
