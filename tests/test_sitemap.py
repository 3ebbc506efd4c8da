"""Sitemap-protocol two-hop expansion (sources/expand.py).

Reference analog: the PoS multi-hop scrape
(hepcrawl/spiders/pos_spider.py:93-199) — a fetched page names the next
pages to fetch.  Pure-batch tests (no Ray session needed)."""

import pyarrow as pa

from hepcrawl_ray.sources import expand as ex

NS = ' xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'


def test_index_hop_namespaced_and_bare():
    idx_ns = (f"<sitemapindex{NS}>"
              "<sitemap><loc> https://a.org/s0.xml </loc></sitemap>"
              "<sitemap><loc>https://a.org/s1.xml</loc></sitemap>"
              "</sitemapindex>")
    idx_bare = ("<sitemapindex>"
                "<sitemap><loc>https://b.org/s0.xml</loc></sitemap>"
                "</sitemapindex>")
    out = ex.expand_sitemap_index(pa.table({
        "site_id": ["a", "b"], "xml": [idx_ns, idx_bare]}))
    assert out.column("site_id").to_pylist() == ["a", "a", "b"]
    assert out.column("sitemap_idx").to_pylist() == [0, 1, 0]
    # loc text is trimmed; namespace presence must not matter
    assert out.column("sitemap_loc").to_pylist() == [
        "https://a.org/s0.xml", "https://a.org/s1.xml",
        "https://b.org/s0.xml"]
    assert out.column("error").to_pylist() == [None, None, None]


def test_url_hop_extracts_loc_and_lastmod():
    sm = (f"<urlset{NS}>"
          "<url><loc>https://a.org/doc/1</loc>"
          "<lastmod>2024-01-02</lastmod></url>"
          "<url><loc>https://a.org/doc/2</loc></url>"
          "</urlset>")
    out = ex.expand_sitemap(pa.table({
        "sitemap_id": ["s0"], "xml": [sm]}))
    assert out.column("loc").to_pylist() == [
        "https://a.org/doc/1", "https://a.org/doc/2"]
    assert out.column("lastmod").to_pylist() == ["2024-01-02", None]
    assert out.column("url_idx").to_pylist() == [0, 1]


def test_errors_become_rows_never_exceptions():
    out = ex.expand_sitemap_index(pa.table({
        "site_id": ["bad", "empty", "noloc"],
        "xml": ["<sitemapindex><sitemap>",          # truncated XML
                f"<sitemapindex{NS}></sitemapindex>",
                "<sitemapindex><sitemap><lastmod>x</lastmod>"
                "</sitemap></sitemapindex>"]}))
    errs = dict(zip(out.column("site_id").to_pylist(),
                    out.column("error").to_pylist()))
    assert errs["bad"].startswith("bad xml")
    assert errs["empty"] == "no <sitemap> entries"
    assert errs["noloc"] == "sitemap without <loc>"
    out2 = ex.expand_sitemap(pa.table({
        "sitemap_id": ["e"], "xml": ["<urlset></urlset>"]}))
    assert out2.column("error").to_pylist() == ["no <url> entries"]
    assert out2.column("url_idx").to_pylist() == [-1]
