"""Incremental harvest windows driven by the LastRunStore.

The reference's OAI spider computes each set's harvest window as
``from_date = explicit or resume_from(set)`` before enumerating, and
persists the window when the run completes, so the next run picks up
where this one finished
(reference: hepcrawl/spiders/common/oaipmh_spider.py:121-151,
lastrunstore_spider.py:53-126).

Here the same contract drives a Dataset enumeration: the window
filters the seed stream *at the read* (no full-corpus scan of already-
harvested rows leaves the source at scale — pair it with partition
pruning on a date-partitioned table), and the store is only advanced
AFTER the consume step succeeds, so a crashed run re-harvests its
window idempotently (output-side dedup is the crawl-once layer's job).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from hepcrawl_ray.state.lastrun import LastRunStore


def require_sets(sets) -> list[str]:
    """Refuse a harvest-all: enumerating a source without explicit
    sets is almost always a mistake at harvest scale (reference:
    hepcrawl/spiders/common/oaipmh_spider.py:114-119 raises the same
    guard).  Accepts a comma-joined string or an iterable; returns the
    cleaned set list."""
    if isinstance(sets, str):
        parsed = [s.strip() for s in sets.split(",") if s.strip()]
    else:
        parsed = [s for s in (sets or []) if s]
    if not parsed:
        raise ValueError(
            "harvesting the whole repository is refused: pass explicit sets")
    return parsed


def harvest_window(store: LastRunStore, set_id: str, *,
                   from_date: str | None = None,
                   until_date: str | None = None) -> tuple[str | None, str | None]:
    """(lo, hi] window for the next run: explicit from_date wins, else
    the store's resume point (reference: oaipmh_spider.py:121-138)."""
    lo = from_date if from_date is not None else store.resume_from(set_id)
    return lo, until_date


def window_filter(date_col: str, lo: str | None, hi: str | None):
    """Batch predicate for the (lo, hi] harvest window over an ISO
    date/timestamp string column.  Lower bound exclusive: ``lo`` is the
    previous run's ``until``, already harvested."""
    def f(t: pa.Table) -> pa.Table:
        col = t.column(date_col)
        mask = None
        if lo is not None:
            mask = pc.greater(col, pa.scalar(lo).cast(col.type))
        if hi is not None:
            m2 = pc.less_equal(col, pa.scalar(hi).cast(col.type))
            mask = m2 if mask is None else pc.and_(mask, m2)
        return t if mask is None else t.filter(mask)
    return f


def run_incremental_harvest(ds, date_col: str, *, store: LastRunStore,
                            set_id: str, until_date: str,
                            from_date: str | None = None,
                            started_at: str = "", consume=None):
    """One windowed harvest run: filter the seed stream to the window,
    hand it to ``consume`` (default: count), then advance the store.

    Returns ``(result, (lo, hi))``.  The store is written only after
    ``consume`` returns — a failed run leaves the window unharvested
    for the retry (reference: save_run on spider close,
    oaipmh_spider.py:138-151)."""
    lo, hi = harvest_window(store, set_id, from_date=from_date,
                            until_date=until_date)
    windowed = ds.map_batches(window_filter(date_col, lo, hi),
                              batch_format="pyarrow")
    result = consume(windowed) if consume is not None else windowed.count()
    store.save(set_id, from_date=lo, until_date=hi,
               started_at=started_at, finished_at=until_date)
    return result, (lo, hi)
