"""Unit tests for the JATS-depth XML parser (hallmark behaviors of
reference: hepcrawl/parsers/jats.py — xref affiliation join, ORCID
normalization, reference extraction, min-date selection)."""

import pytest

from hepcrawl_ray.jats import (
    JatsRecordParser,
    normalize_orcid,
    parse_jats,
    split_page_artid,
)

DOC = """
<article article-type="research-article">
  <front>
    <article-meta>
      <title-group><article-title>Probing <i>X</i> decays</article-title></title-group>
      <article-id pub-id-type="doi">10.1234/abc</article-id>
      <contrib-group>
        <contrib contrib-type="author">
          <string-name>Smith, Jane</string-name>
          <contrib-id contrib-id-type="orcid">https://orcid.org/0000-0002-1825-0097</contrib-id>
          <email>jane@uni.edu</email>
          <xref ref-type="aff" rid="a1"/>
        </contrib>
        <contrib contrib-type="author">
          <name><surname>Doe</surname><given-names>John</given-names></name>
          <xref ref-type="aff" rid="a1 a2"/>
        </contrib>
        <collab>ATLAS Collaboration</collab>
      </contrib-group>
      <aff id="a1"><label>1</label>CERN, Geneva<email>sec@cern.ch</email></aff>
      <aff id="a2"><label>2</label>MIT, Cambridge</aff>
      <abstract>We probe decays.</abstract>
      <pub-date pub-type="ppub"><year>2019</year><month>3</month><day>4</day></pub-date>
      <pub-date pub-type="ppub"><year>2018</year><month>12</month></pub-date>
      <pub-date publication-format="electronic" pub-type="ppub"><year>2017</year></pub-date>
    </article-meta>
  </front>
  <back>
    <ref-list>
      <ref id="r1"><label>[1].</label>
        <mixed-citation publication-type="journal">
          <person-group person-group-type="author">
            <string-name>A. One</string-name><string-name>B. Two</string-name>
          </person-group>
          <source>Phys. Rev. D</source><volume>98</volume><issue>3</issue>
          <year>2018</year>
          <pub-id pub-id-type="doi">10.1103/xyz</pub-id>
          <pub-id pub-id-type="arxiv">1805.00001</pub-id>
          <article-title>First ref</article-title>
          <page-range>23-47</page-range>
        </mixed-citation>
      </ref>
      <ref id="r2"><label>[2]</label>
        <mixed-citation publication-type="book">
          <source>QFT Book</source><publisher-name>Springer</publisher-name>
          <page-range>A12</page-range>
        </mixed-citation>
      </ref>
    </ref-list>
  </back>
</article>
"""


@pytest.fixture(scope="module")
def rec():
    return JatsRecordParser(DOC)


def test_orcid_normalization_variants():
    want = "0000-0002-1825-0097"
    assert normalize_orcid("https://orcid.org/0000-0002-1825-0097") == want
    assert normalize_orcid("http://www.orcid.org/0000-0002-1825-0097/") == want
    assert normalize_orcid("orcid: 0000-0002-1825-0097") == want
    assert normalize_orcid("0000000218250097") == want
    assert normalize_orcid("0000-0002-1825-009x") == "0000-0002-1825-009X"
    assert normalize_orcid("not-an-orcid") is None
    assert normalize_orcid(None) is None


def test_author_with_orcid_email_and_affiliation(rec):
    a = rec.authors[0]
    assert a["full_name"] == "Smith, Jane"
    assert a["orcid"] == "0000-0002-1825-0097"
    assert a["affiliations"] == ["CERN, Geneva"]
    # contrib email first, then the referred-aff email (jats.py:411-418)
    assert a["emails"] == ["jane@uni.edu", "sec@cern.ch"]


def test_multi_rid_xref_resolves_both_affiliations(rec):
    a = rec.authors[1]
    assert a["full_name"] == "Doe, John"
    assert a["orcid"] is None
    assert a["affiliations"] == ["CERN, Geneva", "MIT, Cambridge"]


def test_affiliation_strips_label_and_email(rec):
    assert rec.get_affiliation("a1") == "CERN, Geneva"
    assert rec.get_affiliation("missing") is None


def test_collaborations(rec):
    assert rec.collaborations == ["ATLAS Collaboration"]


def test_min_publication_date_skips_electronic(rec):
    # 2017 is electronic -> skipped; min(2019-03-04, 2018-12-01)
    assert rec.publication_date == "2018-12-01"


def test_reference_journal_fields(rec):
    refs = rec.references
    assert len(refs) == 2
    r = refs[0]
    assert r["label"] == "1"
    assert r["journal_title"] == "Phys. Rev. D"
    assert r["volume"] == "98"
    assert r["issue"] == "3"
    assert r["year"] == 2018
    assert r["doi"] == "10.1103/xyz"
    assert r["arxiv"] == "1805.00001"
    assert r["title"] == "First ref"
    assert r["authors"] == ["A. One", "B. Two"]
    assert r["page_start"] == "23" and r["page_end"] == "47"
    assert r["artid"] is None


def test_reference_book_and_artid(rec):
    r = rec.references[1]
    assert r["journal_title"] is None
    assert r["parent_title"] == "QFT Book"
    assert r["publisher"] == "Springer"
    assert r["artid"] == "A12"
    assert r["page_start"] is None


def test_split_page_artid():
    assert split_page_artid("23-47") == ("23", "47", None)
    assert split_page_artid("L123") == (None, None, "L123")
    assert split_page_artid(None) == (None, None, None)


def test_title_and_abstract_and_doi(rec):
    assert rec.title == "Probing X decays"
    assert rec.abstract == "We probe decays."
    assert rec.dois == ["10.1234/abc"]


def test_parse_error_row():
    out = parse_jats("<article><unclosed></article>")
    assert out["error"] and out["error"].startswith("bad jats record")
    assert out["authors"] == []
