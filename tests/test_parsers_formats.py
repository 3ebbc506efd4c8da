"""Unit tests for the arXiv / NLM / MARCXML record parsers (the §2.3
format inventory beyond JATS)."""

import pytest

from hepcrawl_ray.arxiv import (
    ArxivRecordParser,
    authors_and_collaborations,
    classify_document_type,
    dedupe_list,
    normalize_arxiv_category,
    number_of_pages,
    parse_arxiv,
    split_dois,
    split_report_numbers,
)
from hepcrawl_ray.marc import parse_marcxml
from hepcrawl_ray.nlm import parse_nlm, should_drop

# ------------------------------------------------------------- arXiv ----

ARXIV_DOC = """
<article>
  <id>2101.00001</id>
  <title>On  the   decay of
  X bosons</title>
  <abstract>We study X.</abstract>
  <categories>hep-th alg-geom math.AG hep-th</categories>
  <comments>27 pages, 4 figures; presented at the Snowmass workshop</comments>
  <journal-ref>Phys. Lett. B 123 (2021) 45</journal-ref>
  <report-no>CERN-TH-2021-001, DESY-21-002</report-no>
  <doi>10.1234/a 10.5678/b</doi>
  <authors>
    <author><keyname>Smith</keyname><forenames>Jane</forenames>
      <affiliation>MIT Department of Physics</affiliation></author>
    <author><keyname>Collaboration</keyname><forenames>For the ATLAS</forenames></author>
  </authors>
</article>
"""


def test_arxiv_page_count_and_doctype():
    assert number_of_pages("27 pages, 4 figures") == 27
    assert number_of_pages("no count here") is None
    assert classify_document_type("PhD thesis, 100 pages") == "thesis"
    assert classify_document_type("talk presented at a workshop") == \
        "conference paper"
    assert classify_document_type("12 pages") == "article"
    # word-boundary: 'pres' must not fire inside 'press'
    assert classify_document_type("in press") == "article"


def test_arxiv_category_normalization_and_dedup():
    assert normalize_arxiv_category("alg-geom") == "math.AG"
    assert normalize_arxiv_category("hep-th") == "hep-th"
    assert dedupe_list(["a", "b", "a", "c", "b"]) == ["a", "b", "c"]


def test_arxiv_doi_and_report_split():
    assert split_dois("10.1234/a, 10.5678/b;10.9999/c") == \
        ["10.1234/a", "10.5678/b", "10.9999/c"]
    assert split_report_numbers(["A-1, B-2", "C-3"]) == ["A-1", "B-2", "C-3"]


def test_arxiv_full_record():
    rec = parse_arxiv(ARXIV_DOC)
    assert rec["title"] == "On the decay of X bosons"
    assert rec["arxiv_categories"] == ["hep-th", "math.AG"]  # dedup + modern
    assert rec["number_of_pages"] == 27
    assert rec["document_type"] == "conference paper"
    assert rec["report_numbers"] == ["CERN-TH-2021-001", "DESY-21-002"]
    assert rec["dois"] == ["10.1234/a", "10.5678/b"]
    assert rec["collaborations"] == ["ATLAS"]
    assert [a["full_name"] for a in rec["authors"]] == ["Smith, Jane"]
    assert rec["authors"][0]["affiliations"] == [
        {"value": "MIT Department of Physics"}]


def test_arxiv_collab_in_affiliation_not_institute():
    authors, collabs, warning = authors_and_collaborations([
        ("A.", "One", ["for the CMS Collaboration"]),
        ("B.", "Two", ["University of Somewhere"]),
    ])
    assert collabs == ["CMS"]
    assert [a["surname"] for a in authors] == ["One", "Two"]
    # institute affiliation kept, collaboration affiliation stripped
    assert authors[0]["affiliations"] == []
    assert authors[1]["affiliations"] == [{"value": "University of Somewhere"}]


def test_arxiv_colon_name_warning():
    authors, collabs, warning = authors_and_collaborations([
        (":", "", []),
        ("C.", "Three", []),
    ])
    assert warning is not None and "C. Three" in warning


def test_arxiv_error_row():
    assert parse_arxiv("<broken").get("error", "").startswith("bad arxiv")


# --------------------------------------------------------------- NLM ----

NLM_DOC = """
<Article>
  <Journal><PubDate PubStatus="ppublish">
    <Year>2020</Year><Month>07</Month><Day>03</Day></PubDate></Journal>
  <ArticleTitle>A measurement</ArticleTitle>
  <FirstPage>101</FirstPage><LastPage>110</LastPage>
  <ELocationID EIdType="doi">10.0/fallback</ELocationID>
  <ArticleIdList><ArticleId IdType="doi">10.1/primary</ArticleId></ArticleIdList>
  <PublicationType>Review</PublicationType>
  <AuthorList>
    <Author><LastName>Nu</LastName><FirstName>Ann</FirstName>
      <MiddleName>B</MiddleName>
      <Affiliation>Uni A</Affiliation></Author>
    <Author><LastName>Only</LastName></Author>
  </AuthorList>
</Article>
"""


def test_nlm_full_record():
    rec = parse_nlm(NLM_DOC)
    assert rec["title"] == "A measurement"
    assert rec["dois"] == ["10.1/primary"]  # ArticleIdList wins over ELocation
    assert rec["date_published"] == "2020-07-03"
    assert rec["pub_status"] == "ppublish"
    assert rec["doctype"] == "Review"
    assert "Review" in rec["collections"]
    assert rec["fpage"] == "101" and rec["lpage"] == "110"
    assert rec["page_nr"] == "10"
    assert rec["authors"][0] == {
        "surname": "Nu", "given_names": "Ann B",
        "affiliations": [{"value": "Uni A"}]}
    assert rec["authors"][1] == {"surname": "Only", "given_names": ""}
    assert not rec["dropped"]


def test_nlm_pub_status_drop():
    assert should_drop("aheadofprint") and should_drop("received")
    assert not should_drop("ppublish") and not should_drop(None)


def test_nlm_error_row():
    assert parse_nlm("<oops").get("error", "").startswith("bad nlm")


# ----------------------------------------------------------- MARCXML ----

MARC_DOC = """
<record>
  <controlfield tag="001">123456</controlfield>
  <datafield tag="035" ind1=" " ind2=" ">
    <subfield code="a">oai:cds:123456</subfield></datafield>
  <datafield tag="245" ind1=" " ind2=" ">
    <subfield code="a">Search for exotics</subfield></datafield>
  <datafield tag="520" ind1=" " ind2=" ">
    <subfield code="a">An abstract.</subfield></datafield>
  <datafield tag="100" ind1=" " ind2=" ">
    <subfield code="a">Doe, J.</subfield>
    <subfield code="u">CERN</subfield></datafield>
  <datafield tag="700" ind1=" " ind2=" ">
    <subfield code="a">Roe, R.</subfield></datafield>
  <datafield tag="710" ind1=" " ind2=" ">
    <subfield code="g">LHCb Collaboration</subfield></datafield>
  <datafield tag="024" ind1="7" ind2=" ">
    <subfield code="2">DOI</subfield>
    <subfield code="a">10.7/xyz</subfield></datafield>
  <datafield tag="024" ind1="7" ind2=" ">
    <subfield code="2">arxiv</subfield>
    <subfield code="a">2101.0001</subfield></datafield>
  <datafield tag="260" ind1=" " ind2=" ">
    <subfield code="c">2021-03-01</subfield></datafield>
  <datafield tag="980" ind1=" " ind2=" ">
    <subfield code="a">THESIS</subfield></datafield>
  <datafield tag="856" ind1="4" ind2=" ">
    <subfield code="u">http://cds/record/123456/file.pdf</subfield></datafield>
</record>
"""


def test_marcxml_full_record():
    rec = parse_marcxml(MARC_DOC)
    assert rec["record_id"] == "123456"
    assert rec["external_ids"] == ["oai:cds:123456"]
    assert rec["title"] == "Search for exotics"
    assert rec["abstract"] == "An abstract."
    assert [a["full_name"] for a in rec["authors"]] == ["Doe, J.", "Roe, R."]
    assert rec["authors"][0]["affiliations"] == [{"value": "CERN"}]
    assert rec["collaborations"] == ["LHCb Collaboration"]
    assert rec["dois"] == ["10.7/xyz"]  # the arxiv-scheme 024 is ignored
    assert rec["date_published"] == "2021-03-01"
    assert rec["document_type"] == "thesis"
    assert rec["urls"] == ["http://cds/record/123456/file.pdf"]


def test_marcxml_error_row():
    assert parse_marcxml("<no-record/>")["error"].startswith("bad marcxml")
    assert parse_marcxml("<<<")["error"].startswith("bad marcxml")


# ---------------------------------------------------------------------------
# HEPRecord envelope fields (reference: items.py:117-311; unit goldens
# mirroring tests/unit/test_hindawi.py:104-109 / test_wsp.py style)
# ---------------------------------------------------------------------------

def test_marc_envelope_fields():
    from hepcrawl_ray.marc import marcxml_to_record

    xml = (
        '<record xmlns="http://www.loc.gov/MARC21/slim">'
        '<controlfield tag="001">h1</controlfield>'
        '<datafield tag="245" ind1=" " ind2=" ">'
        '<subfield code="a">T</subfield></datafield>'
        '<datafield tag="300" ind1=" " ind2=" ">'
        '<subfield code="a">12 p</subfield></datafield>'
        '<datafield tag="260" ind1=" " ind2=" ">'
        '<subfield code="b">Hindawi Publishing Corporation</subfield>'
        '<subfield code="c">2015</subfield></datafield>'
        '<datafield tag="980" ind1=" " ind2=" ">'
        '<subfield code="a">HEP</subfield></datafield>'
        '<datafield tag="980" ind1=" " ind2=" ">'
        '<subfield code="a">Citeable</subfield></datafield>'
        '<datafield tag="980" ind1=" " ind2=" ">'
        '<subfield code="a">Published</subfield></datafield>'
        '</record>')
    rec = marcxml_to_record(xml)
    assert rec["page_nr"] == ["12 p"]
    assert rec["source"] == "Hindawi Publishing Corporation"
    # mirror of tests/unit/test_hindawi.py:104-109
    assert rec["collections"]
    for collection in rec["collections"]:
        assert collection in ("HEP", "Citeable", "Published")


def test_jats_keyword_groups():
    from hepcrawl_ray.jats import JatsRecordParser

    xml = ('<article><front><article-meta>'
           '<kwd-group kwd-group-type="author"><kwd>dark matter</kwd>'
           '<kwd>lattice <italic>QCD</italic></kwd></kwd-group>'
           '<kwd-group kwd-group-type="pacs"><kwd>11.30.Er</kwd>'
           '<kwd>12.38.Gc</kwd></kwd-group>'
           '<kwd-group><kwd>extra</kwd></kwd-group>'
           '</article-meta></front></article>')
    p = JatsRecordParser(xml)
    free, pacs = p.keywords
    assert free == ["dark matter", "lattice QCD", "extra"]
    assert pacs == ["11.30.Er", "12.38.Gc"]
    parsed = p.parse()
    assert parsed["free_keywords"] == free
    assert parsed["classification_numbers"] == pacs


def test_nlm_keyword_object_list():
    import xml.etree.ElementTree as ET

    from hepcrawl_ray.nlm import get_keywords, parse_nlm

    xml = ('<Article><Journal><PublisherName>IOP</PublisherName>'
           '</Journal><ArticleTitle>T</ArticleTitle>'
           '<ObjectList>'
           '<Object Type="keyword"><Param Name="value">neutrino</Param>'
           '</Object>'
           '<Object Type="keyword"><Param Name="value">oscillation'
           '</Param><Param Name="other">x</Param></Object>'
           '<Object Type="doi"><Param Name="value">10.1/x</Param>'
           '</Object></ObjectList></Article>')
    assert get_keywords(ET.fromstring(xml)) == ["neutrino",
                                                "oscillation"]
    assert parse_nlm(xml)["free_keywords"] == ["neutrino", "oscillation"]


def test_classification_numbers_processor():
    from hepcrawl_ray.functions.loaders import ClassificationNumbers

    out = ClassificationNumbers()(["11.30.Er", None, "12.38.Gc"])
    assert out == [
        {"standard": "PACS", "classification_number": "11.30.Er"},
        {"standard": "PACS", "classification_number": "12.38.Gc"}]


def test_tohep_envelope_passthrough():
    from hepcrawl_ray.tohep import hepcrawl_to_hep

    rec = hepcrawl_to_hep({
        "titles": [{"title": "T"}],
        "free_keywords": ["dark matter", "", "axions"],
        "external_system_numbers": [
            {"institute": "pos", "value": "PoS(X)001"},
            {"institute": "none", "value": None}],
        "thesis": [{"date": "2020-01-02", "defense_date": "2020-02-03",
                    "degree_type": "PhD",
                    "institutions": ["MIT", ""]}],
        "acquisition_source": {"method": "hepcrawl", "datetime": "d",
                               "source": "synth",
                               "submission_number": "s"}})
    assert rec["keywords"] == [
        {"value": "dark matter", "source": "synth"},
        {"value": "axions", "source": "synth"}]
    assert rec["external_system_numbers"] == [
        {"institute": "pos", "value": "PoS(X)001"}]
    assert rec["thesis_info"] == {
        "date": "2020-01-02", "defense_date": "2020-02-03",
        "degree_type": "PhD", "institutions": [{"name": "MIT"}]}


def test_tohep_envelope_absent_fields_omitted():
    from hepcrawl_ray.tohep import hepcrawl_to_hep

    rec = hepcrawl_to_hep({
        "titles": [{"title": "T"}],
        "acquisition_source": {"method": "m", "datetime": "d",
                               "source": "s", "submission_number": "1"}})
    for k in ("keywords", "external_system_numbers", "thesis_info"):
        assert k not in rec
