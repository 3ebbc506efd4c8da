"""Concrete Source definitions, part 2 (§2.11): the remaining
reference spiders — CDS / Hindawi / Crossref / Elsevier / IOP / PoS /
EDP / APS — end-to-end through the generic run_source runner."""

import pyarrow.parquet as pq

from hepcrawl_ray.sources.definitions import SOURCES, run_source
from hepcrawl_ray.sources.definitions2 import (
    aps_source,
    cds_source,
    crossref_source,
    edp_source,
    elsevier_source,
    hindawi_source,
    iop_source,
    pos_source,
)

SF = "/root/testdata/sf0.001"


def _ids():
    t = pq.read_table(SF + "/documents.parquet", columns=["doc_id"])
    return sorted(t.column("doc_id").to_pylist())


def test_registry_covers_all_reference_spiders():
    """One concrete Source per reference spider module
    (reference: hepcrawl/spiders/ — aps, arxiv, cds, crossref, desy,
    edp, elsevier, hindawi, iop, pos, wsp)."""
    assert set(SOURCES) == {
        "WSP", "DESY", "arXiv", "CDS", "Hindawi", "Crossref",
        "Elsevier", "IOP", "PoS", "EDP", "APS"}


def test_cds_doctype_map(ray_session):
    ids = _ids()
    df = run_source(cds_source(), SF).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert df["doc_id"].tolist() == ids
    want = {0: "thesis", 1: "conference paper", 2: "article", 3: "book"}
    assert (df["document_type"] ==
            (df["doc_id"] % 4).map(want)).all()
    assert (df["record_id"] == "cds" + df["doc_id"].astype(str)).all()


def test_hindawi_envelope_fields(ray_session):
    df = run_source(hindawi_source(), SF).to_pandas()
    assert len(df) == len(_ids())
    assert (df["page_nr"].astype(int) == df["doc_id"] % 40 + 1).all()
    assert (df["publisher"] == "Hindawi Publishing Corporation").all()
    even = df[df["doc_id"] % 2 == 0]
    assert (even["license"] == "CC-BY-3.0").all()
    assert (df["record_id"] == df["doi"]).all()


def test_crossref_book_chapter_journal_null(ray_session):
    df = run_source(crossref_source(), SF).to_pandas()
    bc = df[df["doc_id"] % 4 == 3]
    assert (bc["document_type"] == "book chapter").all()
    assert bc["journal_title"].isna().all()
    rest = df[df["doc_id"] % 4 != 3]
    assert rest["journal_title"].notna().all()
    assert (df["n_references"] == df["doc_id"] % 4).all()


def test_elsevier_harvest_predicate_drops_editorials(ray_session):
    ids = _ids()
    df = run_source(elsevier_source(), SF).to_pandas()
    assert sorted(df["doc_id"]) == [d for d in ids if d % 3 < 2]
    assert set(df["article_type"]) == {"full-length article", "erratum"}


def test_iop_pub_status_quarantine(ray_session):
    ids = _ids()
    df = run_source(iop_source(), SF).to_pandas()
    assert len(df) == len(ids)                 # nothing silently lost
    dropped = df[df["dropped"]]
    assert sorted(dropped["doc_id"]) == [d for d in ids if d % 6 == 3]
    assert (dropped["pub_status"] == "aheadofprint").all()
    assert df["record_id"].notna().all()       # quarantine keeps identity


def test_pos_two_hop_pdf_and_identifier(ray_session):
    df = run_source(pos_source(), SF).to_pandas()
    d = df.iloc[7]                             # doc_id 7 in page p0
    assert d["journal_volume"] == f"SYN{d['doc_id'] % 12}"
    assert d["pdf_key"] == (
        f"SYN{d['doc_id'] % 12}_{d['doc_id'] % 400:03d}.pdf")
    assert (df["record_id"] ==
            "PoS(" + df["journal_volume"] + ")" +
            df["journal_artid"]).all()
    fr = df[df["doc_id"] % 3 == 0]
    assert (fr["language"] == "fr").all()
    assert df[df["doc_id"] % 3 != 0]["language"].isna().all()


def test_edp_format_dispatch(ray_session):
    df = run_source(edp_source(), SF).to_pandas()
    jats = df[df["fmt"] == "jats"]
    rich = df[df["fmt"] == "rich"]
    assert (jats["doc_id"] % 2 == 0).all()
    assert jats["date_published"].isna().all()
    assert (rich["date_published"] ==
            "2013-" + (rich["doc_id"] % 12 + 1).astype(str)).all()
    assert (rich["collections"] == "HEP,Published").all()
    conf = jats[jats["doc_id"] % 7 == 0]
    assert (conf["collections"] == "HEP,ConferencePaper").all()
    assert (df["n_authors"] == df["doc_id"] % 3 + 1).all()


def test_aps_fallback_rows(ray_session):
    df = run_source(aps_source(), SF).to_pandas()
    fb = df[df["used_fallback"]]
    assert sorted(fb["doc_id"]) == [d for d in _ids() if d % 11 == 0]
    assert fb["journal"].isna().all()
    assert (df[~df["used_fallback"]]["journal"] == "PRD").all()
    assert (df["title"] == "APS " + df["doc_id"].astype(str)).all()


def test_done_subtraction_generalizes(ray_session):
    """The listing-minus-done guard works for part-2 sources too
    (grouped seeds subtract whole packages; paged seeds whole pages)."""
    full = run_source(iop_source(), SF).to_pandas()
    pkgs = sorted(set(full["package_id"]))
    done = pkgs[:2]
    df = run_source(iop_source(), SF, done=done).to_pandas()
    assert not set(df["package_id"]) & set(done)
    kept = full[~full["package_id"].isin(done)]
    assert sorted(df["record_id"]) == sorted(kept["record_id"])
