import pytest

from hepcrawl_ray import functions as fn


class TestNames:
    def test_collapse_initials(self):
        assert fn.collapse_initials("T. A.") == "T.A."
        assert fn.collapse_initials("T.-A.") == "T.A."
        assert fn.collapse_initials("Tom") == "Tom"

    def test_split_fullname(self):
        assert fn.split_fullname("Doe, John Magic") == ("Doe", "John Magic")
        assert fn.split_fullname("John Magic Doe") == ("Doe", "John Magic")
        assert fn.split_fullname("") == ("", "")
        assert fn.split_fullname("Doe, John", switch_name_order=True) == ("John", "Doe")

    def test_coll_cleanforthe(self):
        coll, author = fn.coll_cleanforthe("Jane Doe for the ATLAS Collaboration")
        assert coll == "ATLAS"
        assert author == "Jane Doe"
        coll, author = fn.coll_cleanforthe("The CMS Collaboration")
        assert coll == "CMS" and author is None
        coll, author = fn.coll_cleanforthe("Institute for the Study of X")
        assert coll == "Institute for the Study of X" and author is None

    def test_parse_author_str(self):
        a = fn.parse_author_str("D. N. Castillo (IHEP Beijing; CERN)")
        assert a["surname"] == "Castillo"
        assert a["given_names"] == "D.N."
        assert a["full_name"] == "Castillo, D.N."
        assert [x["value"] for x in a["affiliations"]] == ["IHEP Beijing", "CERN"]


class TestText:
    def test_subscripts(self):
        assert fn.convert_html_subscripts_to_latex("H<sub>2</sub>O") == "H$_{2}$O"
        assert fn.convert_html_subscripts_to_latex("E<sup>2</sup>") == "E$^{2}$"
        assert fn.convert_html_subscripts_to_latex("x<inf>i</inf>") == "x$_{i}$"

    def test_remove_tags(self):
        assert fn.remove_tags("<i>x</i> y <b>z</b>", which_ones=("i",)) == "x y <b>z</b>"
        assert fn.remove_tags("<i>x</i> <math>m</math>", keep=("math",)) == "x <math>m</math>"

    def test_remove_tags_with_content(self):
        out = fn.remove_tags_with_content("<label><sup>1</sup></label>CERN", ("label",))
        assert out == "CERN"

    def test_whitespace(self):
        assert fn.clean_whitespace_characters("  a\n b\t\tc  ") == "a b c"

    def test_language(self):
        assert fn.translate_language("en") is None
        assert fn.translate_language("de") == "German"
        assert fn.translate_language("xx") == "Xx"


class TestDates:
    @pytest.mark.parametrize("raw, iso", [
        ("1999-03-04", "1999-03-04"),
        ("4 March 1999", "1999-03-04"),
        ("March 1999", "1999-03"),
        ("1999", "1999"),
        ("1854-07-02", "1854-07-02"),   # pre-1900
        ("2 July 1854", "1854-07-02"),
        ("not a date", None),
    ])
    def test_create_valid_date(self, raw, iso):
        assert fn.create_valid_date(raw) == iso

    def test_format_year(self):
        assert fn.format_year("4 March 1999") == 1999
        assert fn.format_year("garbage") == 0


class TestMisc:
    def test_get_first(self):
        assert fn.get_first(["", None, "x", "y"]) == "x"
        assert fn.get_first([], "d") == "d"

    def test_build_dict(self):
        d = fn.build_dict([{"k": "a", "v": 1}, {"k": "b", "v": 2}], "k")
        assert d["b"]["v"] == 2 and d["b"]["index"] == 1

    def test_has_numbers(self):
        assert fn.has_numbers("abc1") and not fn.has_numbers("abc")

    def test_range_as_string(self):
        assert fn.range_as_string(["1981", "1982", "1985"]) == "1981-1982, 1985"
        assert fn.range_as_string([1, 2, 3]) == "1-3"
        assert fn.range_as_string([7]) == "7"
        assert fn.range_as_string([]) == ""

    def test_journal_section(self):
        assert fn.get_journal_and_section("Physics Letters B") == ("Physics Letters", "B")
        assert fn.get_journal_and_section("Nucl.Phys.") == ("Nucl.Phys.", "")
        assert fn.get_journal_and_section("") == ("", "")

    def test_licenses(self):
        out = fn.get_licenses(license_url="http://cc.org/by/4.0")
        assert out[0]["url"] == "http://cc.org/by/4.0"
        assert fn.get_licenses() == []

    def test_dedupe(self):
        assert fn.dedupe_list([1, 2, 1, 3]) == [1, 2, 3]
        assert fn.dedupe_list_of_dicts([{"a": 1}, {"a": 1}, {"a": 2}]) == [{"a": 1}, {"a": 2}]


class TestCaptionParse:
    def test_golden_equivalence(self):
        from hepcrawl_ray import synth
        from hepcrawl_ray.caption import parse_caption

        imgs, gold = synth.generate_corpus(200)
        fields = ("title", "abstract", "authors", "collaborations", "dois",
                  "date_published", "document_type", "error")
        for cap, exp in zip(imgs.column("caption").to_pylist(), gold.to_pylist()):
            got = parse_caption(cap)
            if exp["error"] is not None:
                assert got["error"] == exp["error"]
            else:
                assert {k: got[k] for k in fields} == {k: exp[k] for k in fields}

    def test_error_row_not_exception(self):
        from hepcrawl_ray.caption import parse_caption, MALFORMED_MSG

        assert parse_caption("complete garbage")["error"] == MALFORMED_MSG
        assert parse_caption("")["error"] == MALFORMED_MSG


class TestCodecs:
    def test_png_roundtrip_exact(self):
        import numpy as np
        from hepcrawl_ray import codecs

        rng = np.random.default_rng(7)
        for shape in [(16, 16, 3), (31, 47, 3), (64, 20, 3)]:
            px = rng.integers(0, 256, size=shape, dtype=np.uint8)
            assert (codecs.decode_png(codecs.encode_png(px)) == px).all()

    def test_lossy_psnr_above_40(self):
        import numpy as np
        from hepcrawl_ray import codecs

        rng = np.random.default_rng(8)
        px = rng.integers(0, 256, size=(48, 48, 3), dtype=np.uint8)
        out = codecs.decode_lossy(codecs.encode_lossy(px))
        assert codecs.psnr(px, out) >= 40.0
        assert not (out == px).all()  # genuinely lossy

    def test_phash_deterministic_and_robust(self):
        import numpy as np
        from hepcrawl_ray import codecs

        rng = np.random.default_rng(9)
        px = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
        h1 = codecs.phash64(px)
        assert h1 == codecs.phash64(px.copy())
        # lossy encode shouldn't move the hash much
        h2 = codecs.phash64(codecs.decode_lossy(codecs.encode_lossy(px)))
        assert bin((h1 ^ h2) & ((1 << 64) - 1)).count("1") <= 8


class TestMultiFormatParsing:
    def test_three_formats_converge(self):
        """caption / json / xml payloads of the same record all parse to
        the identical normalized struct (ParsedItem.to_hep dispatch
        analog, reference: hepcrawl/utils.py:504-550)."""
        from hepcrawl_ray import synth
        from hepcrawl_ray.caption import parse_caption, parse_record

        images, gold = synth.generate_corpus(120)
        fields = ("title", "abstract", "authors", "collaborations", "dois",
                  "date_published", "document_type")
        n = 0
        for cap, g in zip(images.column("caption").to_pylist(),
                          gold.to_pylist()):
            if g["error"] is not None:
                continue
            from_caption = parse_caption(cap)
            from_json = parse_record(synth.render_record_json(g), "json")
            from_xml = parse_record(synth.render_record_xml(g), "xml")
            from_marc = parse_record(synth.render_record_marcxml(g),
                                     "marcxml")
            from_hepcrawl = parse_record(synth.render_record_hepcrawl(g),
                                         "hepcrawl")
            for f in fields:
                assert from_caption[f] == g[f], ("caption", f)
                assert from_json[f] == g[f], ("json", f)
                assert from_xml[f] == g[f], ("xml", f)
                assert from_marc[f] == g[f], ("marcxml", f)
                assert from_hepcrawl[f] == g[f], ("hepcrawl", f)
            n += 1
        assert n > 80

    def test_malformed_payloads_are_error_rows(self):
        from hepcrawl_ray.caption import parse_record

        assert parse_record("{not json", "json")["error"].startswith("bad json")
        assert parse_record("<broken", "xml")["error"].startswith("bad xml")
        assert parse_record("<<<", "marcxml")["error"].startswith("bad marcxml")
        assert parse_record("{bad", "hepcrawl")["error"].startswith(
            "bad hepcrawl")
        assert "unknown record_format" in parse_record("x", "nope")["error"]


class TestLatex:
    def test_latex_to_text(self):
        from hepcrawl_ray.functions.latex import latex_to_text

        assert latex_to_text(r"$\alpha$ decay") == "α decay"
        assert latex_to_text(r"$\sqrt{s} = 13$ TeV") == "√(s) = 13 TeV"
        assert latex_to_text("H$_{2}$O and E$^{2}$") == "H2O and E2"
        assert latex_to_text(r"$x^2 + y_i$") == "x2 + yi"
        # unknown macro passes through as its name, never raises
        assert latex_to_text(r"\unknownmacro{x}") == "unknownmacrox"
        assert latex_to_text(r"$\Lambda \to p \pi$") == "Λ → p π"


class TestLoaders:
    def test_mapcompose_takefirst_join(self):
        from hepcrawl_ray.functions.loaders import (
            Join, MapCompose, TakeFirst, list_to_value_dict)

        chain = MapCompose(str.strip, lambda s: s or None, str.upper)
        assert chain(["  a ", "", "b"]) == ["A", "B"]
        assert TakeFirst()([None, "", "x", "y"]) == "x"
        assert Join(", ")(["a", "b"]) == "a, b"
        assert list_to_value_dict(["x"]) == [{"value": "x"}]

    def test_field_pipeline(self):
        from hepcrawl_ray.functions.loaders import (
            FieldPipeline, MapCompose, TakeFirst)
        from hepcrawl_ray.functions import clean_whitespace_characters

        fp = FieldPipeline({
            "title": (MapCompose(clean_whitespace_characters), TakeFirst()),
        })
        rec = fp({"title": ["  a   b  "], "other": 1})
        assert rec["title"] == "a b" and rec["other"] == 1

    def test_strict_kwargs(self):
        from hepcrawl_ray.functions.loaders import strict_kwargs

        @strict_kwargs({"sets", "from_date"})
        def spider(**kw):
            return kw

        assert spider(sets="a", _private=1) == {"sets": "a", "_private": 1}
        import pytest as _pytest
        with _pytest.raises(TypeError):
            spider(bogus=1)


class TestLastRunStore:
    def test_save_load_resume(self, tmp_path):
        from hepcrawl_ray.state.lastrun import LastRunStore

        store = LastRunStore(str(tmp_path), "arxiv")
        assert store.resume_from("physics") is None
        store.save("physics", from_date="2020-01-01", until_date=None,
                   started_at="2020-02-01T00:00:00",
                   finished_at="2020-02-01T01:00:00")
        assert store.resume_from("physics") == "2020-02-01T01:00:00"
        store.save("physics", from_date="2020-02-01", until_date="2020-03-01",
                   started_at="x", finished_at="y")
        assert store.resume_from("physics") == "2020-03-01"
        # per-set isolation
        assert store.resume_from("math") is None
