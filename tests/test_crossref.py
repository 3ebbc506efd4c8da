"""Unit tests for the Crossref JSON work-record parser, mirroring the
reference's golden shapes (tests/unit/responses/crossref/*_expected.yml)."""

import json

from hepcrawl_ray.crossref import (
    DOC_TYPE_MAP,
    material,
    parse_crossref,
    partial_date,
)

RECORD = {
    "status": "ok",
    "message": {
        "DOI": "10.1109/tasc.2017.2776938",
        "type": "journal-article",
        "title": ["Quench Protection Heater Study"],
        "subtitle": [],
        "container-title": ["IEEE Transactions on Applied Superconductivity"],
        "volume": "28",
        "issue": "3",
        "page": "1-5",
        "issued": {"date-parts": [[2018, 4]]},
        "publisher": "IEEE",
        "source": "Crossref",
        "author": [
            {"ORCID": "http://orcid.org/0000-0002-4869-9338",
             "given": "Kento", "family": "Suzuki", "affiliation": []},
            {"given": "Norio", "family": "Higashi",
             "affiliation": [{"name": "KEK"}]},
        ],
        "license": [{"URL": "http://ieee.org/license"}],
        "reference": [
            {"journal-title": "Phys. Rev.", "volume": "12",
             "first-page": "34", "year": "1999", "DOI": "10.1/x"},
            {"unstructured": "some raw reference"},
            {"journal-title": "Phys. Rev.", "volume": "12",
             "first-page": "34", "year": "1999", "DOI": "10.1/x"},
        ],
    },
}


def test_parse_journal_article_golden_shape():
    rec = parse_crossref(RECORD)
    assert rec["error"] is None
    assert rec["title"] == "Quench Protection Heater Study"
    assert rec["document_type"] == "article"
    assert rec["material"] == "publication"
    assert rec["dois"] == [{"doi": "10.1109/tasc.2017.2776938",
                            "material": "publication"}]
    pub = rec["publication_info"]
    assert pub["journal_title"] == \
        "IEEE Transactions on Applied Superconductivity"
    assert pub["journal_volume"] == "28"
    assert pub["journal_issue"] == "3"
    assert pub["page_start"] == "1" and pub["page_end"] == "5"
    assert pub["year"] == 2018
    assert rec["imprint_date"] == "2018-04"


def test_authors_orcid_normalized_and_name_join():
    rec = parse_crossref(RECORD)
    a0, a1 = rec["authors"]
    assert a0["full_name"] == "Suzuki, Kento"
    assert a0["ids"] == [{"schema": "ORCID",
                          "value": "0000-0002-4869-9338"}]
    assert a1["full_name"] == "Higashi, Norio"
    assert a1["ids"] == []
    assert a1["raw_affiliations"] == ["KEK"]


def test_license_imposing_is_publisher():
    rec = parse_crossref(RECORD)
    assert rec["licenses"] == [{"imposing": "IEEE",
                                "material": "publication",
                                "url": "http://ieee.org/license"}]


def test_reference_dedup_and_raw_ref():
    rec = parse_crossref(RECORD)
    refs = rec["references"]
    assert len(refs) == 2  # exact-duplicate entry removed
    assert refs[0] == {"journal_title": "Phys. Rev.",
                       "journal_volume": "12", "page_start": "34",
                       "year": "1999", "doi": "10.1/x"}
    assert refs[1] == {"raw_ref": {"value": "some raw reference",
                                   "source": "Crossref"}}


def test_doc_type_map_and_unknown_default():
    assert DOC_TYPE_MAP["proceedings-article"] == "conference paper"
    assert DOC_TYPE_MAP["dissertation"] == "thesis"
    rec = parse_crossref({"message": {"type": "posted-content",
                                      "DOI": "10.1/x"}})
    assert rec["document_type"] == "article"  # unknown type -> article


def test_material_prefix_classification():
    assert material({"title": ["Erratum: foo"]}) == "erratum"
    assert material({"title": ["x"], "subtitle": ["Addendum to y"]}) == \
        "addendum"
    assert material({"title": ["Publisher's Note: z"]}) == "editorial note"
    assert material({"title": ["plain"]}) == "publication"


def test_page_single_value_and_partial_dates():
    rec = parse_crossref({"message": {"DOI": "10.1/x", "page": "e4217"}})
    pub = rec["publication_info"]
    assert pub["page_start"] == "e4217" and pub["page_end"] is None
    assert partial_date([2018]) == "2018"
    assert partial_date([2018, 4, 9]) == "2018-04-09"
    assert partial_date([]) is None


def test_book_chapter_suppresses_journal_title():
    rec = parse_crossref({"message": {
        "type": "book-chapter", "DOI": "10.1/c",
        "container-title": ["Some Book"], "ISBN": ["978-1-316-53578-3"]}})
    assert rec["document_type"] == "book chapter"
    assert rec["publication_info"]["journal_title"] is None
    assert rec["publication_info"]["parent_isbn"] == "978-1-316-53578-3"


def test_error_row_contract():
    rec = parse_crossref("{not json")
    assert rec["error"] and rec["title"] is None
    rec = parse_crossref({"no_message": 1})
    assert rec["error"]
    # json-string input parses equivalently to the dict input
    assert parse_crossref(json.dumps(RECORD)) == parse_crossref(RECORD)
