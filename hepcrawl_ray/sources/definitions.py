"""Concrete ``Source`` definitions — the §2.11 extension surface,
proven end-to-end.

The reference adds a new source by subclassing a spider base and
implementing 2-3 methods; the whole arXiv spider is ~100 lines
(reference: hepcrawl/spiders/arxiv_spider.py:23-106,
oaipmh_spider.py:153-173).  Here a new source is three plain
callables on a frozen :class:`Source`, plugged into ONE generic
runner:

- ``seed(sf_dir) -> pa.Table``    the work units (packages / files /
  pages) — metadata-sized, built driver-side, bounded
- ``stages``                      batch fns (``pa.Table -> pa.Table``)
  expanding work units into record rows; errors become ROWS
- ``identifier(t) -> pa.Array``   the record identity column (the
  crawl-once / dedup key)

``run_source`` wires them Ray-Data-first: the seed table is sliced
into chunks (``from_arrow`` yields ONE block otherwise), the stage
chain streams as ``map_batches``, the identifier lands as a
``record_id`` column, and an optional ``done`` set is subtracted at
the SEED — the reference's "FTP listing minus already-downloaded"
guard (hepcrawl/spiders/wsp_spider.py:125-143,
desy_spider.py:124-158).

Three shipped sources mirror three reference spiders:

- :func:`wsp_source` — FTP zip listing -> unzip XML members -> JATS
  parse -> article-type allowlist (wsp_spider.py:34-248)
- :func:`desy_source` — JSONL files -> per-line JSON records with
  error rows for bad lines (desy_spider.py:185-245)
- :func:`arxiv_source` — paged OAI-PMH-style harvest chained by
  resumption links -> arXiv record parse -> category/doctype classify
  (arxiv_spider.py:23-106)
"""

from __future__ import annotations

import io
import json
import os
import zipfile
from dataclasses import dataclass, field
from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# the reference's WSP allowlist (hepcrawl/spiders/wsp_spider.py:82-93)
WSP_ALLOWED_ARTICLE_TYPES = (
    "research-article", "corrected-article", "original-article",
    "introduction", "letter", "correction", "addendum",
    "review-article", "rapid-communications",
)

# deterministic fixture cycle: 3 allowed + 2 dropped types
_WSP_TYPE_CYCLE = ("research-article", "letter", "review-article",
                   "editorial", "news")

_FIXTURE_DOC_CAP = 100_000   # same bound as pipelines/queries.py


@dataclass(frozen=True)
class Source:
    """A source = seed fn + stage chain + identifier fn (§2.11)."""

    name: str
    seed: Callable[[str], pa.Table]
    stages: tuple = field(default_factory=tuple)
    identifier: Callable[[pa.Table], pa.Array] | None = None
    seed_key: str = "package_id"   # the 'done' subtraction column


def run_source(source: Source, sf_dir: str, *, done=None,
               seed_chunks: int = 8):
    """Run a Source end-to-end, returning a streaming Dataset.

    ``done`` is an iterable of already-processed seed keys (package
    ids / file names) subtracted BEFORE any expansion — the listing-
    minus-done guard.  At scale the done list is the output manifest
    (pipelines/sink.py); it is seed-metadata-sized, never record-
    sized, so an in-filter is the right shape.
    """
    import ray

    seed_table = source.seed(sf_dir)
    if done is not None:
        keep = pc.invert(pc.is_in(
            seed_table.column(source.seed_key),
            value_set=pa.array(sorted(set(done)), pa.string())))
        seed_table = seed_table.filter(keep)
    # from_arrow(table) is ONE block (CLAUDE.md lesson 3): slice so
    # package expansion parallelizes across the pool
    n = seed_table.num_rows
    step = max(1, -(-n // seed_chunks))
    refs = [ray.put(seed_table.slice(i, step))
            for i in range(0, max(n, 1), step)]
    ds = ray.data.from_arrow_refs(refs)
    for stage in source.stages:
        ds = ds.map_batches(stage, batch_format="pyarrow")
    if source.identifier is not None:
        ident = source.identifier

        def tag(t: pa.Table) -> pa.Table:
            return t.append_column("record_id", ident(t))

        ds = ds.map_batches(tag, batch_format="pyarrow")
    return ds


def _docs_rows(sf_dir: str, columns=("doc_id", "source", "lang")):
    """Bounded driver-side documents slice for fixture seeds (same
    doc_id predicate as the §2.1 expansion oracles)."""
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=list(columns),
                      filters=[("doc_id", "<", _FIXTURE_DOC_CAP)])
    order = pc.sort_indices(t, sort_keys=[("doc_id", "ascending")])
    return t.take(order)


# ---------------------------------------------------------------------------
# WSP: zip listing -> unzip XML -> JATS parse -> article-type allowlist
# ---------------------------------------------------------------------------

def _wsp_member_xml(doc_id: int, source: str) -> str:
    atype = _WSP_TYPE_CYCLE[doc_id % 5]
    return (
        f'<article article-type="{atype}"><front><article-meta>'
        f'<article-id pub-id-type="doi">10.142/wsp.{doc_id}</article-id>'
        f'<title-group><article-title>WSP {doc_id}</article-title>'
        f'</title-group>'
        f'<contrib-group><contrib contrib-type="author">'
        f'<string-name>Author {doc_id}</string-name>'
        f'<xref ref-type="aff" rid="a0"/></contrib></contrib-group>'
        f'<aff id="a0">Institute of {source}</aff>'
        f'</article-meta></front></article>')


def _wsp_seed(sf_dir: str) -> pa.Table:
    """One zip per documents source (the FTP listing fixture)."""
    docs = _docs_rows(sf_dir)
    pkgs: dict[str, list[int]] = {}
    for did, src in zip(docs.column("doc_id").to_pylist(),
                        docs.column("source").to_pylist()):
        pkgs.setdefault(src, []).append(did)
    names, blobs = [], []
    for src in sorted(pkgs):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            for did in pkgs[src]:
                zf.writestr(f"doc_{did}.xml", _wsp_member_xml(did, src))
        names.append(src)
        blobs.append(buf.getvalue())
    return pa.table({"package_id": pa.array(names, pa.string()),
                     "blob": pa.array(blobs, pa.binary())})


def _wsp_parse_members(t: pa.Table) -> pa.Table:
    """JATS parse of each unzipped member (errors become rows)."""
    from hepcrawl_ray.jats import JatsRecordParser

    pkg, name, atype, title, doi, err = [], [], [], [], [], []
    for p, n, xml in zip(t.column("package_id").to_pylist(),
                         t.column("member_name").to_pylist(),
                         t.column("text").to_pylist()):
        pkg.append(p)
        name.append(n)
        try:
            parser = JatsRecordParser(xml)
            atype.append(parser.root.get("article-type"))
            title.append(parser.title)
            dois = parser.dois
            doi.append(dois[0] if dois else None)
            err.append(None)
        except Exception as exc:  # bad member: an error row, not a crash
            atype.append(None)
            title.append(None)
            doi.append(None)
            err.append(f"bad jats member: {exc}")
    return pa.table({
        "package_id": pa.array(pkg, pa.string()),
        "member_name": pa.array(name, pa.string()),
        "article_type": pa.array(atype, pa.string()),
        "title": pa.array(title, pa.string()),
        "doi": pa.array(doi, pa.string()),
        "error": pa.array(err, pa.string())})


def _wsp_allowlist(t: pa.Table) -> pa.Table:
    """Drop records whose article type is not allowed (reference:
    wsp_spider.py:232-240); error rows pass through for quarantine."""
    keep = pc.or_(
        pc.is_in(t.column("article_type"),
                 value_set=pa.array(WSP_ALLOWED_ARTICLE_TYPES)),
        pc.is_valid(t.column("error")))
    return t.filter(pc.fill_null(keep, False))


def wsp_source() -> Source:
    """World Scientific: zip listing -> unzip -> JATS -> allowlist."""
    from hepcrawl_ray.sources.expand import expand_zip

    def unzip(t: pa.Table) -> pa.Table:
        out = expand_zip(t, suffix=".xml")
        return pa.table({
            "package_id": out.column("package_id"),
            "member_name": out.column("member_name"),
            "text": pc.cast(out.column("member_bytes"), pa.string())})

    return Source(
        name="WSP",
        seed=_wsp_seed,
        stages=(unzip, _wsp_parse_members, _wsp_allowlist),
        identifier=lambda t: t.column("doi"),
    )


# ---------------------------------------------------------------------------
# DESY: JSONL files -> per-line hep records with error rows
# ---------------------------------------------------------------------------

def _desy_seed(sf_dir: str) -> pa.Table:
    """One JSONL file per documents source; every 7th doc's line is
    CORRUPT json (the killed-writer artifact the reference turns into
    ParsedItem.from_exception, desy_spider.py:196-210)."""
    docs = _docs_rows(sf_dir)
    files: dict[str, list[str]] = {}
    for did, src, lang in zip(docs.column("doc_id").to_pylist(),
                              docs.column("source").to_pylist(),
                              docs.column("lang").to_pylist()):
        if did % 7 == 0:
            line = '{"doc_id": %d, "titles": [' % did   # truncated json
        else:
            line = json.dumps({"doc_id": did,
                               "titles": [{"title": f"DESY {did}"}],
                               "lang": lang})
        files.setdefault(src, []).append(line)
    names = sorted(files)
    return pa.table({
        "package_id": pa.array(names, pa.string()),
        "jsonl": pa.array(["\n".join(files[n]) for n in names],
                          pa.string())})


def _desy_parse_lines(t: pa.Table) -> pa.Table:
    """JSON-parse each line; a bad line is an ERROR ROW, never a crash
    (reference: desy_spider.py:196-210 ParsedItem.from_exception)."""
    from hepcrawl_ray.sources.expand import expand_jsonl

    lines = expand_jsonl(t, text_col="jsonl", id_col="package_id")
    fids, dids, titles, langs, errs = [], [], [], [], []
    for fid, blob, err in zip(lines.column("package_id").to_pylist(),
                              lines.column("record_json").to_pylist(),
                              lines.column("error").to_pylist()):
        fids.append(fid)
        if err is not None:
            dids.append(None)
            titles.append(None)
            langs.append(None)
            errs.append(err)
            continue
        try:
            rec = json.loads(blob)
            dids.append(int(rec["doc_id"]))
            titles.append(rec["titles"][0]["title"])
            langs.append(rec.get("lang"))
            errs.append(None)
        except (ValueError, KeyError, IndexError, TypeError) as exc:
            dids.append(None)
            titles.append(None)
            langs.append(None)
            errs.append(f"{type(exc).__name__}: bad hep record")
    return pa.table({
        "file_id": pa.array(fids, pa.string()),
        "doc_id": pa.array(dids, pa.int64()),
        "title": pa.array(titles, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "error": pa.array(errs, pa.string())})


def desy_source() -> Source:
    return Source(
        name="DESY",
        seed=_desy_seed,
        stages=(_desy_parse_lines,),
        identifier=lambda t: pc.if_else(
            pc.is_valid(t.column("doc_id")),
            pc.binary_join_element_wise(
                pa.array(["desy"] * t.num_rows, pa.string()),
                pc.cast(pc.fill_null(t.column("doc_id"), -1),
                        pa.string()), ":"),
            pa.scalar(None, pa.string())),
    )


# ---------------------------------------------------------------------------
# arXiv: paged OAI-PMH-style harvest -> record parse -> classify
# ---------------------------------------------------------------------------

_ARXIV_CATS = ("hep-ex", "hep-th", "math.GT", "astro-ph.CO")


def _arxiv_record_xml(doc_id: int) -> str:
    cat = _ARXIV_CATS[doc_id % 4]
    comments = ("PhD thesis, 120 pages" if doc_id % 10 == 0 else
                "Proceedings of Synth2024" if doc_id % 10 == 5 else
                f"{doc_id % 40 + 1} pages")
    return (
        f"<article><id>2401.{doc_id:05d}</id>"
        f"<title>ArXiv {doc_id}</title>"
        f"<abstract>Abs {doc_id}</abstract>"
        f"<categories>{cat} hep-ph</categories>"
        f"<comments>{comments}</comments>"
        f"<doi>10.48550/arXiv.2401.{doc_id:05d}</doi>"
        f"<author><keyname>Key{doc_id % 9}</keyname>"
        f"<forenames>F.</forenames></author></article>")


def _arxiv_seed(sf_dir: str) -> pa.Table:
    """Pages of 50 ids chained by next links (the ListRecords
    resumption-token walk, reference: oaipmh_spider.py:121-152)."""
    from hepcrawl_ray.sources.paged import follow_linked_pages

    ids = _docs_rows(sf_dir, ("doc_id",)).column("doc_id").to_pylist()
    page_size = 50
    pages = {f"p{i}": ids[i * page_size:(i + 1) * page_size]
             for i in range((len(ids) + page_size - 1) // page_size)}

    def fetch_page(key):
        k = int(key[1:])
        nxt = f"p{k + 1}" if f"p{k + 1}" in pages else None
        return pages[key], nxt

    payloads = follow_linked_pages(fetch_page, "p0" if pages else None)
    page_ids, doc_ids = [], []
    for i, page in enumerate(payloads):
        page_ids.extend([f"p{i}"] * len(page))
        doc_ids.extend(page)
    return pa.table({"package_id": pa.array(page_ids, pa.string()),
                     "doc_id": pa.array(doc_ids, pa.int64())})


def _arxiv_fetch_parse(t: pa.Table) -> pa.Table:
    from hepcrawl_ray.arxiv import ArxivRecordParser

    eprints, cats, dtypes, pages, titles = [], [], [], [], []
    dids = t.column("doc_id").to_pylist()
    for d in dids:
        rec = ArxivRecordParser(_arxiv_record_xml(d)).parse()
        eprints.append(rec["arxiv_eprint"])
        cats.append(rec["arxiv_categories"][0]
                    if rec["arxiv_categories"] else None)
        dtypes.append(rec["document_type"])
        pages.append(rec["number_of_pages"])
        titles.append(rec["title"])
    return pa.table({
        "package_id": t.column("package_id"),
        "doc_id": pa.array(dids, pa.int64()),
        "arxiv_eprint": pa.array(eprints, pa.string()),
        "primary_category": pa.array(cats, pa.string()),
        "document_type": pa.array(dtypes, pa.string()),
        "number_of_pages": pa.array(pages, pa.int64()),
        "title": pa.array(titles, pa.string())})


def arxiv_source() -> Source:
    return Source(
        name="arXiv",
        seed=_arxiv_seed,
        stages=(_arxiv_fetch_parse,),
        identifier=lambda t: t.column("arxiv_eprint"),
    )


SOURCES = {"WSP": wsp_source, "DESY": desy_source, "arXiv": arxiv_source}
