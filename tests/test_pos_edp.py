"""PoS and EDP spider-local builders (mirrors the shapes of the
reference's tests/unit/test_pos.py and tests/unit/test_edp.py)."""

import pytest

from hepcrawl_ray import edp, pos

POS_XML = """
<record xmlns="http://example.org/oai">
 <identifier>oai:pos:LATTICE 2013(001)</identifier>
 <metadata>
  <pex-dc>
   <title>Heavy quarks on the lattice</title>
   <creator>
    <name>El-Khadra, Aida</name>
    <affiliation>INFN and Universita di Firenze</affiliation>
   </creator>
   <creator><name>MacDonald, J.</name></creator>
   <date>2014-03-19</date>
   <publisher>Sissa Medialab</publisher>
   <identifier>PoS(LATTICE 2013)001</identifier>
   <language>en</language>
   <rights>Creative Commons Attribution-NonCommercial-ShareAlike</rights>
  </pex-dc>
 </metadata>
</record>
"""

PAPER_HTML = """
<html><body>
 <a href="/archive/conferences/187/001/LATTICE%202013_001.pdf">pdf</a>
 <a href="/cgi-bin/reader/conf.cgi?confid=187">LATTICE 2013</a>
</body></html>
"""

PROCEEDINGS_HTML = """
<html><body>
 <h1>31st International Symposium on Lattice Field Theory</h1>
 <div class='conference_date'>29 July - 03 August 2013</div>
</body></html>
"""


class TestPosConferencePaper:
    @pytest.fixture(scope="class")
    def item(self):
        pdf = pos.get_conference_paper_pdf_url(
            PAPER_HTML, "https://pos.sissa.it/contribution?id=x")
        return pos.build_conference_paper_item(
            POS_XML, "https://pos.sissa.it/contribution?id=PoS(LATTICE"
            " 2013)001", pdf)

    def test_journal_fields_from_identifier(self, item):
        assert item["journal_title"] == "PoS"
        assert item["journal_volume"] == "LATTICE 2013"
        assert item["journal_artid"] == "001"

    def test_date_and_year(self, item):
        assert item["date_published"] == "2014-03-19"
        assert item["journal_year"] == 2014

    def test_license_from_rights(self, item):
        assert item["license"] == [{
            "license": "Creative Commons Attribution-NonCommercial-"
                       "ShareAlike",
            "url": None, "material": None}]

    def test_language_en_suppressed(self, item):
        assert item["language"] is None

    def test_authors(self, item):
        a = item["authors"]
        assert a[0]["raw_name"] == "El-Khadra, Aida"
        assert a[0]["affiliations"] == [
            {"value": "INFN and Universita di Firenze"}]
        assert a[1] == {"raw_name": "MacDonald, J."}

    def test_document_quoted_url(self, item):
        d = item["documents"][0]
        assert d["key"] == "LATTICE%202013_001.pdf"
        assert d["url"].startswith("https://pos.sissa.it/archive/")
        assert "%2520" in d["url"]  # quote() re-quotes the % itself
        assert d["hidden"] is True and d["fulltext"] is True

    def test_collections_and_source(self, item):
        assert item["collections"] == ["conferencepaper"]
        assert item["source"] == "Sissa Medialab"
        assert item["external_system_numbers"][0]["institute"] == "pos"

    def test_pdf_link_missing_raises(self):
        with pytest.raises(ValueError):
            pos.get_conference_paper_pdf_url(
                "<html><a href='/x'>other</a></html>", "http://b/")

    def test_proceedings_url_from_non_pdf_link(self):
        url = pos.get_proceedings_page_url(
            PAPER_HTML, "https://pos.sissa.it/cgi-bin/reader/conf.cgi"
            "?confid=")
        assert url.endswith("confid=cgi-bin")

    def test_bad_xml_is_error_row(self):
        item = pos.build_conference_paper_item("<broken", "u", "p")
        assert item["error"].startswith("bad pos record")


class TestPosProceedings:
    def test_item(self):
        item = pos.build_conference_proceedings_item(
            PROCEEDINGS_HTML, "PoS(LATTICE 2013)001")
        assert item["title"] == ("Proceedings, 31st International "
                                 "Symposium on Lattice Field Theory")
        assert item["subtitle"] == "29 July - 03 August 2013"
        assert item["journal_title"] == "PoS"
        assert item["journal_volume"] == "LATTICE 2013"
        assert item["collections"] == ["proceedings"]


EDP_REFS_XML = """
<article>
 <back><ref-list>
  <ref id="R1"><label>[1].</label>
   <mixed-citation publication-type="journal" id="ca">
    <string-name><surname>Cole</surname>
     <given-names>A. B.</given-names></string-name>
    <article-title>On synthetic data</article-title>
    <source>Astron. Astrophys. Section A</source>
    <volume>42</volume><issue>3</issue><fpage>100</fpage>
    <year>1999</year>
    <ext-link href="http://dx.doi.org/10.5/xyz">doi link</ext-link>
    <ext-link href="http://example.org/page">page</ext-link>
    <collab>SYNTH</collab>
   </mixed-citation>
   <mixed-citation publication-type="book" id="cb">
    <publisher-name>Wiley</publisher-name>
    <publisher-loc>New York,</publisher-loc>
    <year>2001</year>
   </mixed-citation>
  </ref>
  <ref id="R2"><label>[2]</label>
   <element-citation><year>1987</year></element-citation>
  </ref>
 </ref-list></back>
</article>
"""


class TestEdpReferences:
    @pytest.fixture(scope="class")
    def refs(self):
        return edp.get_references(EDP_REFS_XML)

    def test_sublabel_under_shared_label(self, refs):
        assert refs[0]["number"] == "1a"
        assert refs[1]["number"] == "1b"
        # the no-mixed-citation branch reads the ref node's own @id
        # ('R2' -> sublabel '2'), faithfully mirroring the reference
        # (edp_spider.py:435-440 applies ./@id in both branches)
        assert refs[2]["number"] == "22"

    def test_journal_section_folds_into_volume(self, refs):
        assert refs[0]["journal_title"] == "Astron. Astrophys."
        assert refs[0]["journal_volume"] == "A42"

    def test_doi_and_urls_split(self, refs):
        assert refs[0]["doi"] == "doi:10.5/xyz"
        assert refs[0]["url"] == ["http://example.org/page"]

    def test_author_join_and_fields(self, refs):
        assert refs[0]["authors"] == ["Cole, A. B."]
        assert refs[0]["title"] == "On synthetic data"
        assert refs[0]["fpage"] == "100"
        assert refs[0]["issue"] == "3"
        assert refs[0]["year"] == "1999"
        assert refs[0]["doctype"] == "journal"
        assert refs[0]["collaboration"] == "SYNTH"

    def test_publisher_with_location(self, refs):
        assert refs[1]["publisher"] == "New York: Wiley"

    def test_publisher_loc_from_tail(self):
        xml = ("<ref><mixed-citation>"
               "<publisher-name>Springer</publisher-name>, Berlin"
               "</mixed-citation></ref>")
        r = edp.get_references(f"<a><ref-list>{xml}</ref-list></a>")[0]
        assert r["publisher"] == "Berlin: Springer"


class TestEdpMetadata:
    def test_date_published_rich(self):
        xml = "<doc><Year>2015</Year><MonthNumber>04</MonthNumber></doc>"
        assert edp.get_date_published_rich(xml) == "2015-04"
        assert edp.get_date_published_rich("<doc><Year>2015</Year></doc>") \
            == "2015"
        assert edp.get_date_published_rich("<doc/>") == ""

    def test_collections_dispatch(self):
        conf = "<doc><conference>X</conference></doc>"
        assert edp.get_collections(conf, None, None) == \
            ["HEP", "ConferencePaper"]
        assert edp.get_collections("<doc/>", None,
                                   edp.CONFERENCE_SERIES_TITLE) == \
            ["HEP", "ConferencePaper"]
        assert edp.get_collections("<doc/>", "review-article", "J") == \
            ["HEP", "Review"]
        assert edp.get_collections("<doc/>", "research-article", "J") == \
            ["HEP", "Published"]

    def test_authors_jats_email_strip(self):
        xml = """
        <article><contrib-group>
         <contrib contrib-type="author">
          <name><surname>Wang</surname><given-names>Q.</given-names></name>
          <xref ref-type="aff" rid="a1"/>
         </contrib>
         <contrib contrib-type="editor">
          <name><surname>Skip</surname></name>
         </contrib>
        </contrib-group>
        <aff id="a1"><addr-line>Inst X; e-mail: q@x.org</addr-line></aff>
        </article>"""
        a = edp.get_authors_jats(xml)
        assert len(a) == 1
        assert a[0]["surname"] == "Wang"
        assert a[0]["affiliations"] == [{"value": "Inst X;"}]

    def test_authors_rich(self):
        xml = """
        <doc>
         <Author><AuthorName><FirstName>A</FirstName>
          <MiddleName>B</MiddleName><LastName>Chen</LastName></AuthorName>
          <AffiliationID Label="f1"/></Author>
         <Affiliation ID="f1">
          <UnstructuredAffiliation>Inst Y</UnstructuredAffiliation>
         </Affiliation>
        </doc>"""
        a = edp.get_authors_rich(xml)
        assert a == [{"surname": "Chen", "given_names": "A B",
                      "affiliations": [{"value": "Inst Y"}]}]
