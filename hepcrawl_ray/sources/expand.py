"""Expansion operators: package/feed rows -> record rows (flat_map shape).

Each is a vectorized ``map_batches`` body that turns one input row into
many output rows — the Ray-Data form of the reference's generators:

- ``expand_zip`` / ``expand_tar``: extract members from an archive
  ``binary`` column (reference: unzip_xml_files hepcrawl/utils.py:44-54,
  EDPSpider.untar_files hepcrawl/spiders/edp_spider.py:205-219,
  IOPSpider.untar_files hepcrawl/spiders/iop_spider.py:132-147) —
  with an optional already-extracted skip set (anti-join semantics).
- ``expand_xml_feed``: split one XML document into per-record node
  strings by ``itertag`` (reference: XMLFeedSpider usage,
  hepcrawl/spiders/wsp_spider.py:75-80, hindawi_spider.py:62-71).
- ``expand_jsonl``: split a JSONL blob into parsed rows; malformed
  lines become error ROWS, never exceptions
  (reference: DesySpider.parse, hepcrawl/spiders/desy_spider.py:185-210).
- ``paged_enumerate``: deterministic pagination of a work list into
  (page, token) units — the resumption-token paging shape
  (reference: OAIPMHSpider.parse_list,
  hepcrawl/spiders/common/oaipmh_spider.py:192-214).

All return ``pa.Table`` and carry the source row's id for lineage.
"""

from __future__ import annotations

import io
import json
import tarfile
import zipfile
import xml.etree.ElementTree as ET

import pyarrow as pa


def expand_zip(batch: pa.Table, *, blob_col: str = "blob",
               id_col: str = "package_id", suffix: str | None = None,
               skip_names: set[str] | None = None) -> pa.Table:
    """One row per archive member (optionally filtered by suffix and an
    already-extracted skip set)."""
    pkg, name, data, err = [], [], [], []
    for pid, blob in zip(batch.column(id_col).to_pylist(),
                         batch.column(blob_col).to_pylist()):
        try:
            with zipfile.ZipFile(io.BytesIO(blob)) as zf:
                for info in zf.infolist():
                    if info.is_dir():
                        continue
                    if suffix and not info.filename.endswith(suffix):
                        continue
                    if skip_names and info.filename in skip_names:
                        continue
                    pkg.append(pid)
                    name.append(info.filename)
                    data.append(zf.read(info))
                    err.append(None)
        except Exception as exc:
            pkg.append(pid)
            name.append(None)
            data.append(None)
            err.append(f"bad zip: {exc}")
    return pa.table({id_col: pkg, "member_name": name,
                     "member_bytes": pa.array(data, type=pa.binary()),
                     "error": pa.array(err, type=pa.string())})


def expand_tar(batch: pa.Table, *, blob_col: str = "blob",
               id_col: str = "package_id", suffix: str | None = None,
               skip_names: set[str] | None = None) -> pa.Table:
    pkg, name, data, err = [], [], [], []
    for pid, blob in zip(batch.column(id_col).to_pylist(),
                         batch.column(blob_col).to_pylist()):
        try:
            with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
                for member in tf.getmembers():
                    if not member.isfile():
                        continue
                    if suffix and not member.name.endswith(suffix):
                        continue
                    if skip_names and member.name in skip_names:
                        continue
                    pkg.append(pid)
                    name.append(member.name)
                    data.append(tf.extractfile(member).read())
                    err.append(None)
        except Exception as exc:
            pkg.append(pid)
            name.append(None)
            data.append(None)
            err.append(f"bad tar: {exc}")
    return pa.table({id_col: pkg, "member_name": name,
                     "member_bytes": pa.array(data, type=pa.binary()),
                     "error": pa.array(err, type=pa.string())})


def expand_xml_feed(batch: pa.Table, *, xml_col: str = "xml",
                    id_col: str = "feed_id", itertag: str = "record") -> pa.Table:
    """Split each XML document into serialized per-record nodes."""
    fid, idx, node, err = [], [], [], []
    for f, doc in zip(batch.column(id_col).to_pylist(),
                      batch.column(xml_col).to_pylist()):
        try:
            root = ET.fromstring(doc)
            found = root.iter(itertag)
            n = 0
            for el in found:
                fid.append(f)
                idx.append(n)
                node.append(ET.tostring(el, encoding="unicode"))
                err.append(None)
                n += 1
            if n == 0:
                fid.append(f)
                idx.append(-1)
                node.append(None)
                err.append(f"no <{itertag}> nodes")
        except ET.ParseError as exc:
            fid.append(f)
            idx.append(-1)
            node.append(None)
            err.append(f"bad xml: {exc}")
    return pa.table({id_col: fid, "record_idx": pa.array(idx, pa.int32()),
                     "record_xml": pa.array(node, pa.string()),
                     "error": pa.array(err, pa.string())})


def _localname(tag: str) -> str:
    """XML tag -> local name (namespace-agnostic: real sitemaps carry
    the sitemaps.org xmlns, hand-rolled ones often don't)."""
    return tag.rsplit("}", 1)[-1]


def expand_sitemap_index(batch: pa.Table, *, xml_col: str = "xml",
                         id_col: str = "site_id") -> pa.Table:
    """Sitemap-protocol INDEX hop: ``<sitemapindex><sitemap><loc>`` ->
    one row per child sitemap (site_id, sitemap_idx, sitemap_loc, err).

    First hop of the crawl-discovery chain (reference analog: the PoS
    multi-hop scrape, hepcrawl/spiders/pos_spider.py:93-199 — a page
    whose records are themselves pages to fetch).  Bad XML becomes an
    error ROW, never an exception (errors-as-rows channel)."""
    sid, idx, loc, err = [], [], [], []
    for s, doc in zip(batch.column(id_col).to_pylist(),
                      batch.column(xml_col).to_pylist()):
        try:
            root = ET.fromstring(doc)
            n = 0
            for el in root.iter():
                if _localname(el.tag) != "sitemap":
                    continue
                child_loc = None
                for sub in el:
                    if _localname(sub.tag) == "loc":
                        child_loc = (sub.text or "").strip()
                sid.append(s)
                idx.append(n)
                loc.append(child_loc)
                err.append(None if child_loc else "sitemap without <loc>")
                n += 1
            if n == 0:
                sid.append(s)
                idx.append(-1)
                loc.append(None)
                err.append("no <sitemap> entries")
        except ET.ParseError as exc:
            sid.append(s)
            idx.append(-1)
            loc.append(None)
            err.append(f"bad xml: {exc}")
    return pa.table({id_col: sid,
                     "sitemap_idx": pa.array(idx, pa.int32()),
                     "sitemap_loc": pa.array(loc, pa.string()),
                     "error": pa.array(err, pa.string())})


def expand_sitemap(batch: pa.Table, *, xml_col: str = "xml",
                   id_col: str = "sitemap_id") -> pa.Table:
    """Sitemap-protocol URL hop: ``<urlset><url><loc>/<lastmod>`` ->
    one row per URL (sitemap_id, url_idx, loc, lastmod, err).  Second
    hop of the discovery chain; output rows are frontier seed
    candidates (canonicalize -> seen-filter -> admit)."""
    sid, idx, loc, lastmod, err = [], [], [], [], []
    for s, doc in zip(batch.column(id_col).to_pylist(),
                      batch.column(xml_col).to_pylist()):
        try:
            root = ET.fromstring(doc)
            n = 0
            for el in root.iter():
                if _localname(el.tag) != "url":
                    continue
                u_loc, u_mod = None, None
                for sub in el:
                    name = _localname(sub.tag)
                    if name == "loc":
                        u_loc = (sub.text or "").strip()
                    elif name == "lastmod":
                        u_mod = (sub.text or "").strip()
                sid.append(s)
                idx.append(n)
                loc.append(u_loc)
                lastmod.append(u_mod)
                err.append(None if u_loc else "url without <loc>")
                n += 1
            if n == 0:
                sid.append(s)
                idx.append(-1)
                loc.append(None)
                lastmod.append(None)
                err.append("no <url> entries")
        except ET.ParseError as exc:
            sid.append(s)
            idx.append(-1)
            loc.append(None)
            lastmod.append(None)
            err.append(f"bad xml: {exc}")
    return pa.table({id_col: sid,
                     "url_idx": pa.array(idx, pa.int32()),
                     "loc": pa.array(loc, pa.string()),
                     "lastmod": pa.array(lastmod, pa.string()),
                     "error": pa.array(err, pa.string())})


def expand_jsonl(batch: pa.Table, *, text_col: str = "jsonl",
                 id_col: str = "file_id") -> pa.Table:
    """One row per JSONL line; bad lines become error rows."""
    fid, idx, rec, err = [], [], [], []
    for f, blob in zip(batch.column(id_col).to_pylist(),
                       batch.column(text_col).to_pylist()):
        for i, line in enumerate(blob.splitlines()):
            line = line.strip()
            if not line:
                continue
            fid.append(f)
            idx.append(i)
            try:
                rec.append(json.dumps(json.loads(line), sort_keys=True))
                err.append(None)
            except Exception as exc:
                rec.append(None)
                err.append(f"bad json line: {exc}")
    return pa.table({id_col: fid, "line_idx": pa.array(idx, pa.int32()),
                     "record_json": pa.array(rec, pa.string()),
                     "error": pa.array(err, pa.string())})


def paged_enumerate(total: int, page_size: int) -> pa.Table:
    """Deterministic page units with resumption tokens: the driver-side
    enumeration of a paged source (pages chain token -> token, so a
    resume can start from the last finished token)."""
    pages = []
    tokens = []
    offsets = []
    n = 0
    page = 0
    while n < total:
        pages.append(page)
        offsets.append(n)
        tokens.append(f"tok-{n}")
        n += page_size
        page += 1
    return pa.table({"page": pa.array(pages, pa.int32()),
                     "offset": pa.array(offsets, pa.int64()),
                     "token": pa.array(tokens, pa.string())})


def open_access_fanout(batch: pa.Table, *, journal_col: str,
                       doi_col: str, open_journals: frozenset,
                       doi_resolver: str = "http://dx.doi.org/"
                       ) -> pa.Table:
    """Per-journal open-access conditional fan-out (reference:
    EDPSpider.parse_node, hepcrawl/spiders/edp_spider.py:125-127,
    243-255 — PDFs are fetched ONLY for open-access journals).

    Every input row emits a ``record`` row; rows with a DOI whose
    journal is in ``open_journals`` ALSO emit a ``fetch`` row carrying
    the resolver URL — the 1->2 routing that feeds the fetch stage in
    the crawl pipeline.  Fully vectorized (Arrow filter + concat); at
    scale this is a stateless flat_map with no shuffle."""
    import pyarrow.compute as pc

    rec = batch.append_column("kind", pa.array(
        ["record"] * batch.num_rows, pa.string()))
    rec = rec.append_column("fetch_url",
                            pa.nulls(batch.num_rows, pa.string()))
    gate = pc.and_(
        pc.is_valid(batch.column(doi_col)),
        pc.is_in(batch.column(journal_col),
                 value_set=pa.array(sorted(open_journals), pa.string())))
    hits = batch.filter(gate)
    urls = pc.binary_join_element_wise(
        pa.array([doi_resolver] * hits.num_rows, pa.string()),
        hits.column(doi_col).cast(pa.string()), "")
    fetch = hits.append_column("kind", pa.array(
        ["fetch"] * hits.num_rows, pa.string()))
    fetch = fetch.append_column("fetch_url", urls)
    return pa.concat_tables([rec, fetch])
