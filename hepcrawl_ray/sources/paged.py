"""Paged REST-source semantics: Link rel=next following and the
harvest predicate.

- ``follow_linked_pages``: sequential page enumeration following a
  ``next`` pointer until exhausted — the APS REST pagination shape
  (reference: hepcrawl/spiders/aps_spider.py:113-118 parses the Link
  header and yields the next request until none remains).  Paging is
  inherently sequential (token/link chains), so the loop is
  driver-side and CHEAP (one metadata fetch per page); the returned
  per-page record batches feed a Dataset for the parallel per-record
  fan-out — the same split the reference has between its page loop
  and per-DOI requests.
- ``fetch_with_fallback``: per-record primary fetch with a fallback
  parse on failure (reference: aps_spider.py:103-110 requests JATS
  per DOI with ``_parse_json_on_failure`` as errback) — errors become
  rows, never exceptions.
- ``should_harvest``: the Elsevier harvest predicate — doctype in the
  allowlist AND title AND journal AND volume AND (artid OR
  page_start) (reference: hepcrawl/parsers/elsevier.py:79-90,
  686-696).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# reference: hepcrawl/parsers/elsevier.py:79-90
DOCTYPES_TO_HARVEST = (
    "full-length article", "addendum", "chapter", "erratum",
    "review article", "short communication", "short survey",
    "publisher's note", "discussion",
)


def follow_linked_pages(fetch_page, first: str | None,
                        max_pages: int = 100_000) -> list:
    """Follow ``next`` links from ``first`` until None (or the guard).

    ``fetch_page(page_key) -> (payload, next_key | None)``.  Returns
    the payloads in page order.  The guard bounds a cyclic link chain
    (a real crawler's defense against a self-linking page)."""
    pages = []
    seen = set()
    key = first
    for _ in range(max_pages):
        if key is None or key in seen:
            break
        seen.add(key)
        payload, key_next = fetch_page(key)
        pages.append(payload)
        key = key_next
    return pages


def fetch_with_fallback(batch: pa.Table, primary_fn, fallback_fn,
                        key_col: str = "doi",
                        fields: tuple[str, ...] | None = None) -> pa.Table:
    """Per-record primary fetch + fallback parse, errors as rows.

    ``primary_fn(key) -> dict`` (raises on failure),
    ``fallback_fn(key) -> dict``.  Output rows carry ``used_fallback``
    and merge the parsed fields of whichever path succeeded.

    Pass ``fields`` (the full output field set) whenever the two paths
    can return DIFFERENT keys or a batch could miss a field entirely —
    per-batch field inference would otherwise emit blocks with
    inconsistent schemas across the dataset."""
    keys = batch.column(key_col).to_pylist()
    recs, fb = [], []
    for k in keys:
        try:
            recs.append(primary_fn(k))
            fb.append(False)
        except Exception:
            recs.append(fallback_fn(k))
            fb.append(True)
    out_fields = (list(fields) if fields is not None
                  else sorted({f for r in recs for f in r}))
    cols = {key_col: batch.column(key_col)}
    for f in out_fields:
        cols[f] = pa.array([r.get(f) for r in recs])
    cols["used_fallback"] = pa.array(fb, pa.bool_())
    return pa.table(cols)


def should_harvest(article_type, title, journal_title, journal_volume,
                   artid, page_start) -> np.ndarray:
    """Vectorized Elsevier harvest predicate over column arrays
    (reference: elsevier.py:686-696)."""
    def truthy(xs):
        return np.array([bool(x) for x in xs], dtype=bool)

    at = np.array([(x or "") in DOCTYPES_TO_HARVEST for x in article_type],
                  dtype=bool)
    return (at & truthy(title) & truthy(journal_title)
            & truthy(journal_volume)
            & (truthy(artid) | truthy(page_start)))
