"""ElsevierRecordParser unit tests (mirrors the shapes of the
reference's tests/unit/test_elsevier.py fixtures: a full-length
article with RDF metadata, author groups with refid affiliations,
structured bib-references, and the harvest predicate edges)."""

import pytest

from hepcrawl_ray.elsevier import (
    COPYRIGHT_MAPPING,
    DOCTYPE_MAPPING,
    ElsevierRecordParser,
    parse_elsevier,
)

FULL = """
<doc>
 <RDF><Description>
   <doi>10.1016/j.synth.2020.135021</doi>
   <publicationName>Physics Letters, Section B</publicationName>
   <volume>135</volume>
   <startingPage>12</startingPage>
   <endingPage>19</endingPage>
   <coverDisplayDate>15 March 2020</coverDisplayDate>
   <copyright>© 2020 The Authors</copyright>
   <licenseLine>CC BY 3.0</licenseLine>
   <openAccessInformation>
     <userLicense>http://creativecommons.org/licenses/by/3.0/</userLicense>
   </openAccessInformation>
   <availableOnlineInformation>
     <availableOnline>4 February 2020</availableOnline>
   </availableOnlineInformation>
   <publisher>Elsevier B.V.</publisher>
 </Description></RDF>
 <article docsubtype="fla">
  <item-info>
    <jid>PLB</jid>
    <aid>135021</aid>
    <copyright type="full-transfer" year="2020">© Publisher Text</copyright>
  </item-info>
  <head>
   <title>Dark <it>matter</it> searches</title>
   <subtitle>A synthetic record</subtitle>
   <abstract>
     <abstract-sec><simple-para>First para.</simple-para>
     <simple-para>Second para.</simple-para></abstract-sec>
   </abstract>
   <abstract graphical="graphical-abstract">
     <abstract-sec><simple-para>IGNORED</simple-para></abstract-sec>
   </abstract>
   <author-group>
    <author>
      <given-name>Alice</given-name><surname>Apex</surname>
      <e-address type="email">alice@inst0.org</e-address>
      <cross-ref refid="af0"/><cross-ref refid="af1"/>
    </author>
    <author>
      <given-name>Bob</given-name><surname>Briar</surname><suffix>Jr.</suffix>
    </author>
    <affiliation id="af0"><textfn>Institute Zero</textfn></affiliation>
    <affiliation id="af1"><textfn>Institute One</textfn></affiliation>
    <collaboration><text>SYNTH Collaboration</text></collaboration>
   </author-group>
   <keywords>
     <keyword><text>dark matter</text></keyword>
     <keyword><text>collider</text></keyword>
   </keywords>
   <keywords abr="abbrev"><keyword><text>DM</text></keyword></keywords>
  </head>
 </article>
 <bib-reference id="b1">
   <label>[1]</label>
   <reference>
     <contribution><authors>
       <author><given-name>C.</given-name><surname>Case</surname></author>
     </authors></contribution>
     <series><title><maintitle>J. Synth. Phys.</maintitle></title></series>
     <volume-nr>42</volume-nr>
     <issue-nr>3</issue-nr>
     <date>1999</date>
     <pages><first-page>100</first-page><last-page>110</last-page></pages>
     <doi>10.5555/42</doi>
   </reference>
 </bib-reference>
 <bib-reference id="b2">
   <label>[2]</label>
   <other-ref><textref>Unstructured ref text</textref></other-ref>
 </bib-reference>
</doc>
"""


@pytest.fixture(scope="module")
def parsed():
    return ElsevierRecordParser(FULL)


class TestElsevierMetadata:
    def test_article_type_and_material(self, parsed):
        assert parsed.article_type == "full-length article"
        assert parsed.material == "publication"

    def test_document_type(self, parsed):
        assert parsed.document_type == "article"

    def test_journal_title_section_removed(self, parsed):
        # ' Section' removed, comma stripped: 'Physics Letters, Section
        # B' -> 'Physics Letters B' (reference: elsevier.py:303-310)
        assert parsed.journal_title == "Physics Letters B"

    def test_journal_volume_and_pages(self, parsed):
        assert parsed.journal_volume == "135"
        assert parsed.page_start == "12"
        assert parsed.page_end == "19"

    def test_artid(self, parsed):
        assert parsed.artid == "135021"

    def test_dois(self, parsed):
        assert parsed.dois == [{"doi": "10.1016/j.synth.2020.135021",
                                "material": "publication"}]

    def test_copyright(self, parsed):
        c = parsed.copyright
        assert c["holder"] == "© Publisher Text"
        assert c["statement"] == "© 2020 The Authors"
        assert c["year"] == 2020

    def test_license(self, parsed):
        li = parsed.license
        assert li["license"] == "CC BY 3.0"
        assert li["url"].endswith("/by/3.0/")

    def test_dates(self, parsed):
        assert parsed.publication_date == "2020-03-15"
        assert parsed.imprints_date == "2020-02-04"
        assert parsed.year == 2020

    def test_title_strips_markup(self, parsed):
        assert parsed.title == "Dark matter searches"
        assert parsed.subtitle == "A synthetic record"

    def test_abstract_joins_paras_skips_graphical(self, parsed):
        assert parsed.abstract == "First para. Second para."

    def test_keywords_skip_abbreviated(self, parsed):
        assert parsed.keywords == ["dark matter", "collider"]

    def test_collaborations(self, parsed):
        assert parsed.collaborations == ["SYNTH Collaboration"]

    def test_publisher_default(self):
        p = ElsevierRecordParser("<doc><article/></doc>")
        assert p.publisher == "Elsevier B.V."


class TestElsevierAuthors:
    def test_refid_affiliations(self, parsed):
        a = parsed.authors[0]
        assert a["full_name"] == "Apex, Alice"
        assert a["raw_affiliations"] == ["Institute Zero", "Institute One"]
        assert a["emails"] == ["alice@inst0.org"]

    def test_group_affiliations_fallback_and_suffix(self, parsed):
        b = parsed.authors[1]
        assert b["full_name"] == "Briar, Bob, Jr."
        # no refids -> all of the group's affiliations
        assert b["raw_affiliations"] == ["Institute Zero", "Institute One"]
        assert b["emails"] == []


class TestElsevierReferences:
    def test_structured_reference(self, parsed):
        r = parsed.references[0]
        assert r["label"] == "1"
        assert r["journal_title"] == "J. Synth. Phys."
        assert r["journal_volume"] == "42"
        assert r["journal_issue"] == "3"
        assert r["year"] == "1999"
        assert r["doi"] == "10.5555/42"
        assert (r["page_start"], r["page_end"]) == ("100", "110")
        assert r["authors"] == ["C. Case"]

    def test_other_ref_kept_with_raw(self, parsed):
        r = parsed.references[1]
        assert r["label"] == "2"
        assert "Unstructured ref text" in r["raw_ref"]
        assert r["journal_title"] is None


class TestElsevierPredicates:
    def test_harvest_true(self, parsed):
        assert parsed.should_record_be_harvested()

    def test_harvest_false_doctype(self):
        xml = FULL.replace('docsubtype="fla"', 'docsubtype="adv"')
        assert not ElsevierRecordParser(xml).should_record_be_harvested()

    def test_harvest_false_missing_pages_and_artid(self):
        xml = (FULL.replace("<startingPage>12</startingPage>", "")
               .replace("<aid>135021</aid>", ""))
        assert not ElsevierRecordParser(xml).should_record_be_harvested()

    def test_conference_via_issue_name(self):
        xml = FULL.replace(
            "<publisher>",
            "<issueName>Proceedings of SYNTH-20</issueName><publisher>")
        assert ElsevierRecordParser(xml).document_type == "conference paper"

    def test_copyright_holder_mapping_fallback(self):
        xml = FULL.replace("© Publisher Text", "")
        p = ElsevierRecordParser(xml)
        assert p.copyright_holder == COPYRIGHT_MAPPING["full-transfer"]

    def test_material_variants(self):
        for ab, want in (("err", "erratum"), ("add", "addendum"),
                         ("edi", "editorial note"),
                         ("pub", "editorial note"),
                         ("rev", "publication")):
            xml = FULL.replace('docsubtype="fla"', f'docsubtype="{ab}"')
            p = ElsevierRecordParser(xml)
            assert p.material == want, ab
            assert p.article_type == DOCTYPE_MAPPING[ab]

    def test_month_range_cover_date(self):
        xml = FULL.replace("15 March 2020", "July-September 2020")
        p = ElsevierRecordParser(xml)
        assert p.publication_date == "2020-09"
        assert p.year == 2020

    def test_parse_elsevier_error_row(self):
        rec = parse_elsevier("<doc><unclosed>")
        assert rec["error"] and rec["title"] is None
        assert rec["harvest"] is False

    def test_simple_article_publication_doi(self):
        xml = FULL.replace(
            '<article docsubtype="fla">',
            '<simple-article docsubtype="err">'
            "<item-info><document-thread><refers-to-document>"
            "<doi>10.1016/parent</doi></refers-to-document>"
            "</document-thread></item-info>").replace(
            "</article>", "</simple-article>")
        p = ElsevierRecordParser(xml)
        assert p.dois == [
            {"doi": "10.1016/j.synth.2020.135021", "material": "erratum"},
            {"doi": "10.1016/parent", "material": "publication"}]
