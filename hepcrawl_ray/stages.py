"""map_batches stages: fetch, parse, verify — the dataflow after the frontier.

Each stage is a callable class (Ray actor-pool UDF): expensive setup in
``__init__`` (once per actor), vectorized work in ``__call__`` (per
Arrow batch) — the pattern the reference approximates with
process-lifetime state (LaTeX context DB built once,
reference: hepcrawl/parsers/arxiv.py:84-91; spider-lifetime S3/FTP
sessions, reference: hepcrawl/spiders/desy_spider.py:94-122).

- FetchStage: admitted URL rows -> image rows.  In this sandbox the
  "network" is the corpus table itself: a lookup of the URL's terminal
  path segment (image_id) against a broadcast index (``ray.put`` once,
  ``ray.get`` in ``__init__`` — never re-shipped per batch).  At 100 TB
  the same stage shape does batched key lookups against the storage
  layer (Lance take / HTTP fetch with a connection pool in __init__);
  only this stage touches image bytes.  Missing keys become error ROWS
  (reference: error ParsedItem, hepcrawl/utils.py:492-502), never
  exceptions.
- ParseStage: caption -> record struct columns (hepcrawl_ray.caption)
  + image decode verification (decoded w/h vs declared, recomputed
  phash) — the per-row invariant of BASELINE.json.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hepcrawl_ray import codecs, urlkit
from hepcrawl_ray.caption import parse_caption_batch
from hepcrawl_ray.synth import GOLDEN_SCHEMA

FETCH_ERROR_NOT_FOUND = "fetch failed: image not found"

RECORD_FIELDS = ("title", "abstract", "authors", "collaborations", "dois",
                 "date_published", "document_type")


PAYLOAD_COLS = ("bytes", "w", "h", "fmt", "caption", "phash")


def _fetch_output(batch: pa.Table, image_ids, found: np.ndarray,
                  taken: pa.Table) -> pa.Table:
    """Assemble the fetch-stage output: batch + payload columns
    (null where not found) + error ROWS for missing keys (reference:
    error ParsedItem, hepcrawl/utils.py:492-502) — never exceptions."""
    null_mask = pa.array(~found)
    n = len(image_ids)
    ids = image_ids if isinstance(image_ids, (pa.Array, pa.ChunkedArray)) \
        else pa.array(image_ids, type=pa.string())

    def col(name):
        c = taken.column(name)
        if found.all():
            return c
        return pa.compute.if_else(null_mask, pa.nulls(n, c.type), c)

    out = batch.append_column("image_id", ids)
    for name in PAYLOAD_COLS:
        out = out.append_column(name, col(name))
    error = pa.array([None if ok else FETCH_ERROR_NOT_FOUND for ok in found],
                     type=pa.string())
    return out.append_column("fetch_error", error)


class FetchStage:
    """Resolve admitted URLs to corpus rows via a broadcast index.

    SMALL-CORPUS path only (dimension-sized image tables, tests, the
    sf0.001 flagship): every actor holds the whole table.  The scale
    path is :class:`KeyedFetchStage` — pass a corpus PATH instead of a
    table/ref anywhere a pipeline accepts ``images``."""

    def __init__(self, images_ref):
        import pandas as pd
        import ray

        images: pa.Table = ray.get(images_ref) if not isinstance(images_ref, pa.Table) \
            else images_ref
        self.images = images
        # hash engine built lazily in C on first get_indexer, memoized
        self.index = pd.Index(images.column("image_id").to_pandas())

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_arr = urlkit.image_ids_of_many(batch.column("url"))
        rows = self.index.get_indexer(ids_arr.to_pandas())
        found = rows >= 0
        # gather found rows from the corpus in one take()
        taken = self.images.take(pa.array(np.where(found, rows, 0)))
        return _fetch_output(batch, ids_arr, found, taken)


class KeyedFetchStage:
    """Batched keyed lookup against the STORED corpus — the 100-TB
    fetch shape.  Actors hold O(manifest + a few row groups), never
    the corpus:

    - ``__init__`` reads ONLY parquet row-group statistics (min/max
      image_id per row group — a few bytes per GB of corpus) into a
      range manifest.
    - ``__call__`` maps the batch's keys onto candidate row groups via
      vectorized searchsorteds over a MIN-SORTED manifest (O(batch ×
      log groups) per batch — independent of the manifest size), reads
      JUST those row groups (one IO per group, LRU-cached across
      consecutive batches — admission order is roughly key-clustered
      per frontier partition), and gathers rows with one C-level
      hash-index probe (``pandas.Index.get_indexer``).

    At real scale the same stage shape does Lance ``take`` / object-
    store range reads; the row-group manifest generalizes to any
    key-range-indexed layout.  ``max_resident_rows`` records the high
    water mark of corpus rows held, so tests can assert O(batch);
    ``last_candidates_checked`` records how many manifest entries the
    last selection examined, so tests can assert it tracks the batch's
    key spread, NOT the total number of row groups."""

    def __init__(self, corpus_path, cache_rowgroups: int = 8):
        import glob
        import os
        from collections import OrderedDict

        import pyarrow.parquet as pq

        if isinstance(corpus_path, (list, tuple)):
            paths = list(corpus_path)
        elif os.path.isdir(corpus_path):
            paths = sorted(glob.glob(os.path.join(corpus_path, "*.parquet")))
        else:
            paths = [corpus_path]
        self.files = []
        mins, maxs, locs = [], [], []
        for path in paths:
            f = pq.ParquetFile(path)
            ki = f.schema_arrow.get_field_index("image_id")
            for rg in range(f.metadata.num_row_groups):
                st = f.metadata.row_group(rg).column(ki).statistics
                if st is None or not st.has_min_max:
                    raise ValueError(
                        f"corpus {path} row group {rg} lacks image_id "
                        "min/max statistics — rewrite with stats enabled")
                mins.append(st.min)
                maxs.append(st.max)
                locs.append((len(self.files), rg))
            self.files.append(f)
        # sorted manifest: fixed-width unicode arrays (C-level
        # searchsorted) ordered by (min, max); cmax = running max of
        # maxes handles OVERLAPPING key ranges across files
        mins_u = np.asarray(mins, dtype=np.str_)
        maxs_u = np.asarray(maxs, dtype=np.str_)
        order = np.lexsort((maxs_u, mins_u))
        self.rg_min = mins_u[order]
        self.rg_max = maxs_u[order]
        # running max via object dtype (np.maximum lacks a str loop);
        # one-time O(G) at init, stored fixed-width for C searchsorted
        self.rg_cmax = np.maximum.accumulate(
            self.rg_max.astype(object)).astype(np.str_)
        self.rg_loc = [locs[j] for j in order]
        self.cache: "OrderedDict[tuple, pa.Table]" = OrderedDict()
        self.cache_rowgroups = cache_rowgroups
        self.max_resident_rows = 0
        self.last_candidates_checked = 0
        # working-set memo: consecutive batches usually hit the SAME
        # row-group set (key-clustered admissions, or a small corpus
        # fitting the cache) — reuse the assembled table + hash index
        # instead of re-concatenating and re-hashing per batch
        self._ws_need: tuple = ()
        self._ws_corpus: pa.Table | None = None
        self._ws_index = None  # pandas.Index (engine memoized on it)

    def _select_rowgroups(self, su: np.ndarray) -> np.ndarray:
        """Manifest indices of row groups whose [min, max] range
        contains at least one requested key.

        ``su``: sorted unique keys (unicode dtype).  Two vectorized
        searchsorteds bound each key's candidate window in the
        min-sorted manifest ([first cmax >= key, last min <= key));
        windows are merged and only the candidates inside them are
        verified — cost O(|su| log G + |candidates|), never O(G)."""
        right = np.searchsorted(self.rg_min, su, side="right")
        left = np.searchsorted(self.rg_cmax, su, side="left")
        nonempty = right > left
        if not nonempty.any():
            self.last_candidates_checked = 0
            return np.empty(0, dtype=np.int64)
        lo, hi = left[nonempty], right[nonempty]
        # merge the (sorted, possibly overlapping) windows [lo_i, hi_i)
        run_hi = np.maximum.accumulate(hi)
        new_seg = np.empty(lo.size, dtype=bool)
        new_seg[0] = True
        new_seg[1:] = lo[1:] > run_hi[:-1]
        starts = lo[new_seg]
        seg_idx = np.nonzero(new_seg)[0]
        last = np.append(seg_idx[1:] - 1, lo.size - 1)
        ends = run_hi[last]
        cand = np.concatenate([np.arange(s, e)
                               for s, e in zip(starts, ends)])
        self.last_candidates_checked = int(cand.size)
        # verify: candidate j is needed iff some key in [min_j, max_j]
        klo = np.searchsorted(su, self.rg_min[cand], side="left")
        khi = np.searchsorted(su, self.rg_max[cand], side="right")
        return cand[khi > klo]

    def _rowgroup(self, j: int) -> pa.Table:
        key = self.rg_loc[j]
        t = self.cache.pop(key, None)
        if t is None:
            fi, rg = key
            t = self.files[fi].read_row_group(rg)
        self.cache[key] = t                      # move to MRU
        while len(self.cache) > self.cache_rowgroups:
            self.cache.popitem(last=False)
        return t

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_arr = urlkit.image_ids_of_many(batch.column("url"))
        n = len(ids_arr)
        if n == 0:
            need = np.empty(0, dtype=np.int64)
        else:
            su = np.unique(ids_arr.to_numpy(zero_copy_only=False)
                           .astype(np.str_))
            need = self._select_rowgroups(su)
        if not need.size:
            sch = self.files[0].schema_arrow
            taken = pa.table({f.name: pa.nulls(n, f.type) for f in sch})
            return _fetch_output(batch, ids_arr, np.zeros(n, bool), taken)
        need_key = tuple(need.tolist())
        if need_key != self._ws_need or self._ws_corpus is None:
            import pandas as pd

            corpus = pa.concat_tables([self._rowgroup(j) for j in need])
            self._ws_need = need_key
            self._ws_corpus = corpus
            # pandas Index: hash engine built once (lazily, in C) per
            # working set, probed per batch with get_indexer
            self._ws_index = pd.Index(corpus.column("image_id").to_pandas())
            resident = corpus.num_rows + sum(
                t.num_rows for k, t in self.cache.items()
                if k not in {self.rg_loc[j] for j in need})
            self.max_resident_rows = max(self.max_resident_rows, resident)
        corpus, index = self._ws_corpus, self._ws_index
        rows = index.get_indexer(ids_arr.to_pandas())
        found = rows >= 0
        taken = corpus.take(pa.array(np.where(found, rows, 0)))
        return _fetch_output(batch, ids_arr, found, taken)


class FetchParseStage:
    """Fused fetch + parse in one actor (the default pipeline shape).

    Payload bytes are gathered AND consumed (decode/verify) inside the
    same actor, so multi-KB blobs never transit the object store
    between stages — at 4M URLs that hop alone is ~7 GB.  Keep the
    split stages only when fetch and parse need different resources
    (e.g. parse on GPU).
    """

    def __init__(self, images_ref, verify_pixels: bool = True,
                 drop_bytes: bool = False, discover_args=None):
        # a str/list ref is a STORED corpus -> keyed lookup (scale
        # path); a table/ObjectRef is the small-corpus broadcast
        self.fetch = (KeyedFetchStage(images_ref)
                      if isinstance(images_ref, (str, list, tuple))
                      else FetchStage(images_ref))
        self.parse = ParseStage(verify_pixels=verify_pixels,
                                drop_bytes=drop_bytes)
        # (discover_fn, actors, num_partitions, salted_hosts) enables
        # in-stage link discovery: links found at parse time go back
        # to the frontier from THIS actor (see DiscoverRouteStage)
        self.discover = (DiscoverRouteStage(*discover_args)
                         if discover_args else None)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = self.parse(self.fetch(batch))
        if self.discover is not None:
            out = self.discover(out)
        return out


class ParseStage:
    """Parse captions into record columns + verify decoded pixels."""

    def __init__(self, verify_pixels: bool = True, drop_bytes: bool = False):
        self.verify_pixels = verify_pixels
        self.drop_bytes = drop_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # fetch-error rows blank their caption: the batch parser then
        # emits exactly the EMPTY_RECORD shape, and the fetch error
        # string overrides the malformed-caption error below — no
        # per-row Python for the happy path (vectorized RE2 parse,
        # parity pinned by tests/test_caption_batch.py)
        fetch_err_col = batch.column("fetch_error")
        has_ferr = pc.is_valid(fetch_err_col.combine_chunks()
                               if isinstance(fetch_err_col,
                                             pa.ChunkedArray)
                               else fetch_err_col)
        caps = pc.if_else(has_ferr, pa.scalar("", pa.string()),
                          pc.fill_null(batch.column("caption"), ""))
        parsed = parse_caption_batch(caps)
        parsed["error"] = pc.if_else(has_ferr, fetch_err_col,
                                     parsed["error"])
        n_rows = batch.num_rows

        verify_ok = np.ones(n_rows, dtype=bool)
        phash_decoded = np.zeros(n_rows, dtype=np.int64)
        if self.verify_pixels:
            blobs = batch.column("bytes").to_pylist()
            fmts = batch.column("fmt").to_pylist()
            ws = batch.column("w").to_pylist()
            hs = batch.column("h").to_pylist()
            decoded_lum, decoded_idx = [], []
            for i, (blob, fmt) in enumerate(zip(blobs, fmts)):
                if blob is None:
                    verify_ok[i] = False
                    continue
                try:
                    # fused decode-to-luma: dims + hash input without
                    # ever materializing the RGB array (~100 KB of
                    # DRAM traffic saved per image in the hot stage)
                    gray, w_dec, h_dec = codecs.decode_luma(blob, fmt)
                except Exception:
                    verify_ok[i] = False
                    continue
                verify_ok[i] = (h_dec == hs[i] and w_dec == ws[i])
                decoded_lum.append(gray)
                decoded_idx.append(i)
            if decoded_lum:
                # batched hash: fixed-overhead numpy calls amortize
                # across every image in the batch
                phash_decoded[np.asarray(decoded_idx)] = \
                    codecs.phash64_many_from_luma(decoded_lum)

        # bytes are consumed here (decode+verify); the records table
        # downstream carries parse + verify columns only — re-shipping
        # multi-KB blobs through every later stage would double the
        # object-store traffic for no reader
        out = batch.drop_columns(["bytes"]) if self.drop_bytes else batch
        for name in RECORD_FIELDS + ("error",):
            out = out.append_column(name, parsed[name])
        out = out.append_column("pixels_verified", pa.array(verify_ok))
        out = out.append_column("phash_decoded", pa.array(phash_decoded))
        return out


class DiscoverRouteStage:
    """In-stage link discovery: links extracted from admitted rows are
    routed straight back to the frontier actors (worker -> actor; no
    driver round-trip per row).

    The production shape of the iterative crawl (reference analog: the
    PoS 3-hop chain, hepcrawl/spiders/pos_spider.py:93-199, where each
    parse callback yields the next request): composed after parse in
    :class:`FetchParseStage` or run standalone over an admission table.
    Delivery is awaited INSIDE the call (``ray.get`` on the offer
    refs), so when the Dataset consuming this stage completes, every
    discovered link is already buffered in its frontier partition —
    the driver can seal without polling.

    Determinism: admission is decided over a seq-sorted view at seal
    (frontier.seal), so the arbitrary arrival order of per-batch
    offers cannot change the schedule — pinned by the in-stage ==
    driver-loop == simulator test (tests/test_sources_iterative.py).
    """

    def __init__(self, discover_fn, actors, num_partitions,
                 salted_hosts=None, discover_batch_fn=None,
                 buffered=False):
        from hepcrawl_ray.frontier import (
            canonicalize_batch,
            route_partition_ids,
        )

        self.discover_fn = discover_fn
        self.actors = actors
        self.num_partitions = num_partitions
        self.salted_hosts = salted_hosts
        self.discover_batch_fn = discover_batch_fn
        self._canon = canonicalize_batch
        self._route_ids = route_partition_ids
        # buffered=True: __call__ accumulates canonical offers locally
        # and flush() delivers ONE merged table per partition — the
        # offer fan-in otherwise serializes on the receiving actors'
        # inboxes (one offer call per (chunk, partition); CLAUDE.md
        # lesson 28), which capped the iterative crawl at ~1/3 of the
        # non-iterative headline.  Arrival order is irrelevant
        # (admission is decided over a seq-sorted view at seal), so
        # merging preserves the exact schedule.
        self.buffered = buffered
        self._buf: list[pa.Table] = []

    def _deliver(self, offers: pa.Table):
        import ray

        parts = self._route_ids(offers.column("host").to_pylist(),
                                offers.column("url_hash").to_numpy(),
                                self.num_partitions, self.salted_hosts)
        pending = []
        for p in np.unique(parts):
            sub = offers.filter(pa.array(parts == p))
            pending.append(self.actors[int(p)].offer.remote(sub))
        ray.get(pending)       # delivered before return

    def flush(self) -> int:
        """Deliver all buffered offers (one merged table per
        partition) and await delivery; returns rows delivered."""
        if not self._buf:
            return 0
        offers = pa.concat_tables(self._buf).combine_chunks()
        self._buf = []
        self._deliver(offers)
        return offers.num_rows

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.discover_batch_fn is not None:
            # vectorized contract: (urls, seqs) -> (offer table with
            # url/priority/seq/mtime/set_id columns, per-row link
            # counts).  Production link extraction happens on parsed
            # BATCHES, so this is the scale path; per-row discover_fn
            # stays the executable spec (equivalence pinned in
            # tests/test_sources_iterative.py).  At 61 us/row the
            # per-row Python callback dominated the iterative bench's
            # wall clock.
            raw, counts = self.discover_batch_fn(
                batch.column("url"), batch.column("seq"))
            n_links = np.asarray(counts, dtype=np.int64)
        else:
            n_links = np.zeros(batch.num_rows, dtype=np.int64)
            new_rows: list[dict] = []
            for i, (url, seq) in enumerate(
                    zip(batch.column("url").to_pylist(),
                        batch.column("seq").to_pylist())):
                found = self.discover_fn(url, seq)
                n_links[i] = len(found)
                new_rows.extend(found)
            raw = pa.table({
                "url": [r["url"] for r in new_rows],
                "priority": [float(r.get("priority", 0.0))
                             for r in new_rows],
                "seq": [int(r["seq"]) for r in new_rows],
                "mtime": [int(r.get("mtime", 0)) for r in new_rows],
                "set_id": [r.get("set_id", "") for r in new_rows],
            }) if new_rows else None
        if raw is not None and raw.num_rows:
            offers = self._canon(raw)
            if self.buffered:
                self._buf.append(offers)   # delivered at flush()
            else:
                self._deliver(offers)      # delivered before batch returns
        return batch.append_column("n_links", pa.array(n_links))
