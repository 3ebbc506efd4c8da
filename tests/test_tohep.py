"""tohep normalization unit tests (mirrors the shapes of the
reference's tests/unit/test_tohep.py:51-59 — record conversion
round-trips plus the documents patch join)."""

import pytest

from hepcrawl_ray.tohep import (
    get_updated_documents,
    hep_to_hep,
    hepcrawl_to_hep,
    has_publication_info,
    normalize_hepcrawl_record,
)


def wide_item(**over):
    item = {
        "title": "A title",
        "subtitle": "A subtitle",
        "abstract": "An abstract",
        "date_published": "2020-03-15",
        "copyright_holder": "Publisher",
        "copyright_year": 2020,
        "copyright_statement": "(c)",
        "copyright_material": "publication",
        "journal_title": "Phys.Synth.",
        "journal_volume": "12",
        "journal_year": 2020,
        "journal_fpage": "1",
        "journal_lpage": "9",
        "page_nr": ["9"],
        "authors": [{"full_name": "Apex, Alice",
                     "affiliations": [{"value": "Inst A"}, {"value": ""}]}],
        "dois": [{"value": "10.7/x", "material": "publication"}],
        "collections": [{"primary": "HEP"}, {"primary": "Citeable"},
                        {"primary": "Published"}],
        "acquisition_source": {"method": "hepcrawl",
                               "datetime": "2024-03-01T00:00:00",
                               "source": "Elsevier",
                               "submission_number": "s1"},
    }
    item.update(over)
    return item


class TestNormalize:
    def test_list_shaping(self):
        out = normalize_hepcrawl_record(wide_item(), "Elsevier")
        assert out["titles"] == [{"title": "A title",
                                  "subtitle": "A subtitle",
                                  "source": "Elsevier"}]
        assert out["abstracts"] == [{"value": "An abstract",
                                     "source": "Elsevier"}]
        assert out["imprints"] == [{"date": "2020-03-15"}]
        assert out["copyright"][0]["holder"] == "Publisher"
        # consumed flat keys are gone
        for k in ("title", "abstract", "journal_title", "journal_year"):
            assert k not in out

    def test_publication_info_only_when_present(self):
        out = normalize_hepcrawl_record(wide_item(), "X")
        pub = out["publication_info"][0]
        assert pub["journal_title"] == "Phys.Synth."
        assert pub["year"] == 2020          # int-coerced
        bare = wide_item(journal_title="", journal_volume="",
                         journal_year="", journal_fpage="",
                         journal_lpage="")
        assert not has_publication_info(bare)
        out2 = normalize_hepcrawl_record(bare, "X")
        assert "publication_info" not in out2

    def test_related_article_doi_merged(self):
        out = normalize_hepcrawl_record(
            wide_item(related_article_doi=[{"value": "10.7/rel",
                                           "material": "erratum"}]), "X")
        assert [d["value"] for d in out["dois"]] == ["10.7/x", "10.7/rel"]


class TestHepcrawlToHep:
    def test_full_conversion(self):
        rec = hepcrawl_to_hep(normalize_hepcrawl_record(
            wide_item(), "Elsevier"))
        assert rec["titles"][0]["title"] == "A title"
        assert rec["authors"][0]["raw_affiliations"] == ["Inst A"]
        assert rec["number_of_pages"] == 9
        assert rec["citeable"] is True
        assert rec["refereed"] is True
        assert rec["document_type"] == ["article"]
        assert rec["publication_info"][0]["journal_title"] == "Phys.Synth."
        assert rec["acquisition_source"]["submission_number"] == "s1"

    def test_collection_dispatch(self):
        rec = hepcrawl_to_hep(normalize_hepcrawl_record(wide_item(
            collections=[{"primary": "Core"}, {"primary": "Review"},
                         {"primary": "ConferencePaper"},
                         {"primary": "Thesis"},
                         {"primary": "Withdrawn"},
                         {"primary": "arXiv"}]), "X"))
        assert rec["core"] is True
        assert rec["publication_types"] == ["review"]
        assert rec["document_type"] == ["conference paper", "thesis"]
        assert rec["withdrawn"] is True

    def test_bad_page_nr_skipped(self):
        rec = hepcrawl_to_hep(normalize_hepcrawl_record(
            wide_item(page_nr=["n/a"]), "X"))
        assert "number_of_pages" not in rec

    def test_noncore_sets_false(self):
        rec = hepcrawl_to_hep(normalize_hepcrawl_record(wide_item(
            collections=[{"primary": "NONCORE"}]), "X"))
        assert rec["core"] is False


class TestDocumentsPatch:
    def test_basename_join_patches_url(self):
        docs = [{"url": "http://h/f/a.pdf", "old_url": "http://h/f/a.pdf"}]
        out = get_updated_documents(
            docs, [{"name": "dl/a.pdf", "path": "/store/0/a.pdf"}])
        assert out[0]["url"] == "/store/0/a.pdf"
        assert out[0]["old_url"] == "http://h/f/a.pdf"
        assert out[0]["key"] == "a.pdf"

    def test_unmatched_keeps_old_url(self):
        docs = [{"url": "http://h/f/b.pdf", "old_url": "http://h/f/b.pdf"}]
        out = get_updated_documents(
            docs, [{"name": "a.pdf", "path": "/store/0/a.pdf"}])
        assert out[0]["url"] == "http://h/f/b.pdf"
        assert "key" not in out[0]

    def test_hep_to_hep_no_files_is_identity(self):
        rec = {"documents": [{"url": "u", "key": "k"}]}
        assert hep_to_hep(rec, []) is rec
        assert rec["documents"][0]["url"] == "u"

    def test_existing_key_preserved(self):
        docs = [{"url": "http://h/f/a.pdf", "old_url": "http://h/f/a.pdf",
                 "key": "mykey"}]
        out = get_updated_documents(
            docs, [{"name": "a.pdf", "path": "/p/a.pdf"}])
        assert out[0]["key"] == "mykey"


# ---------------------------------------------------------------------------
# validate_hep_record (the LiteratureBuilder.validate boundary)
# ---------------------------------------------------------------------------

def _valid_rec():
    return {
        "titles": [{"title": "A title", "subtitle": "", "source": "s"}],
        "document_type": ["article"],
        "acquisition_source": {"method": "hepcrawl",
                               "datetime": "2024-03-01T00:00:00",
                               "source": "arXiv",
                               "submission_number": "s1"},
        "dois": [{"value": "10.1234/abc.5", "material": "publication"}],
        "imprints": [{"date": "2021-03-15"}],
        "number_of_pages": 12,
        "authors": [{"full_name": "Name, G.", "raw_affiliations": []}],
        "publication_info": [{"year": 2021}],
    }


def test_validate_valid_record():
    from hepcrawl_ray.tohep import validate_hep_record

    assert validate_hep_record(_valid_rec()) == []


def test_validate_each_planted_failure():
    from hepcrawl_ray.tohep import validate_hep_record

    cases = [
        (lambda r: r.__setitem__("titles", []),
         "titles: required and non-empty"),
        (lambda r: r["titles"][0].__setitem__("title", "  "),
         "titles[0].title: empty"),
        (lambda r: r.__setitem__("document_type", []),
         "document_type: required and non-empty"),
        (lambda r: r.__setitem__("document_type", ["fanfic"]),
         "document_type[0]: unknown value 'fanfic'"),
        (lambda r: r.pop("acquisition_source"),
         "acquisition_source: required"),
        (lambda r: r["acquisition_source"].__setitem__("method", ""),
         "acquisition_source.method: required"),
        (lambda r: r["dois"][0].__setitem__("value", "not-a-doi"),
         "dois[0].value: not a DOI: 'not-a-doi'"),
        (lambda r: r["imprints"][0].__setitem__("date", "15/13/2020"),
         "imprints[0].date: not an ISO date: '15/13/2020'"),
        (lambda r: r["imprints"][0].__setitem__("date", "2021-13"),
         "imprints[0].date: not an ISO date: '2021-13'"),
        (lambda r: r["imprints"][0].__setitem__("date", "2021-02-30"),
         "imprints[0].date: not an ISO date: '2021-02-30'"),
        (lambda r: r.__setitem__("number_of_pages", -5),
         "number_of_pages: not a positive int: -5"),
        (lambda r: r.__setitem__("number_of_pages", True),
         "number_of_pages: not a positive int: True"),
        (lambda r: r["authors"][0].__setitem__("full_name", ""),
         "authors[0].full_name: empty"),
        (lambda r: r["publication_info"][0].__setitem__("year", 99),
         "publication_info[0].year: out of range: 99"),
    ]
    for corrupt, want in cases:
        rec = _valid_rec()
        corrupt(rec)
        errs = validate_hep_record(rec)
        assert errs == [want], f"{want}: got {errs}"


def test_validate_partial_dates_and_minimal_record():
    from hepcrawl_ray.tohep import validate_hep_record

    for good in ("2021", "2021-03", "1890-02-28"):
        rec = _valid_rec()
        rec["imprints"][0]["date"] = good
        assert validate_hep_record(rec) == [], good
    # minimal record: only the three required groups
    rec = {"titles": [{"title": "t"}], "document_type": ["thesis"],
           "acquisition_source": {"method": "m", "datetime": "d",
                                  "source": "s", "submission_number": "1"}}
    assert validate_hep_record(rec) == []


def test_validate_error_order_is_pinned():
    """first_error ordering is part of the oracle contract."""
    from hepcrawl_ray.tohep import validate_hep_record

    rec = _valid_rec()
    rec["titles"][0]["title"] = ""
    rec["document_type"] = ["fanfic"]
    rec["dois"][0]["value"] = "bad"
    rec["imprints"][0]["date"] = "x"
    rec["number_of_pages"] = 0
    errs = validate_hep_record(rec)
    assert errs == [
        "titles[0].title: empty",
        "document_type[0]: unknown value 'fanfic'",
        "dois[0].value: not a DOI: 'bad'",
        "imprints[0].date: not an ISO date: 'x'",
        "number_of_pages: not a positive int: 0",
    ]
