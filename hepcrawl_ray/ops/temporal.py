"""Temporal join operators Ray Data lacks natively: backward as-of
join and range-join aggregate.

The reference joins records to "the latest prior state" in two places
— incremental-harvest windows pick up from the last run's timestamp
(hepcrawl/spiders/common/lastrunstore_spider.py:52-88) and the DESY
spider pairs each record with its most recent crawl result
(hepcrawl/spiders/desy_spider.py:150-210).  Generalized here as the
standard streaming/temporal shapes a training-data pipeline needs
(event attribution, feature windows).

Execution shape (the repo's house pattern, see ops/dedup.py):
both sides are tagged and UNIONED into one Dataset, bucketed by
``hash(by) % num_buckets``, and matched inside
``groupby("bucket").map_groups`` with a pandas/numpy body — ONE keyed
shuffle total, per-key work in C (sort + searchsorted), no
``Dataset.join`` (crashes on empty shuffle partitions, see CLAUDE.md
lesson 11).  At 100 TB the bucket count rises with cluster size and a
hot key (one user with millions of events) is bounded by that user's
own row count — the per-segment searchsorted is O(n log n) in the
segment, never a cross product.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _int_ns(series: pd.Series) -> np.ndarray:
    """Timestamp/int column -> int64 (ns for datetimes, raw for ints)."""
    if pd.api.types.is_datetime64_any_dtype(series):
        return series.astype("datetime64[ns]").astype("int64").to_numpy()
    return series.astype("int64").to_numpy()


def asof_join(left, right, *, by, on, tie, payload,
              suffix="_r", num_buckets=64,
              left_schema=None, right_schema=None):
    """Backward as-of join: for each left row, the right row with the
    greatest ``on`` <= left ``on`` and the same ``by`` key; ties on
    ``on`` break to the greatest ``tie``.  INNER semantics (left rows
    with no prior right row are dropped).

    ``left`` / ``right`` are Datasets sharing integer key ``by``,
    orderable ``on`` (timestamp or int) and integer ``tie``; ``payload``
    names the right columns to attach (emitted as ``{col}{suffix}``).
    Output: every left column plus the payload columns, one row per
    matched left row.
    """
    # Ray can't report a schema for an all-empty map-derived
    # Dataset; callers pass the pa.Schema fallbacks so an empty shard
    # still joins (to nothing) instead of crashing
    ls = left.schema(fetch_if_missing=True) or left_schema
    rs = right.schema(fetch_if_missing=True) or right_schema
    left_cols = list(ls.names)
    ltypes = dict(zip(ls.names, ls.types))
    rtypes = dict(zip(rs.names, rs.types))
    pay_out = [f"{c}{suffix}" for c in payload]

    def prep_left(t: pa.Table) -> pa.Table:
        key = t.column(by).to_numpy().astype(np.int64)
        cols = {c: t.column(c) for c in left_cols}
        for c, o in zip(payload, pay_out):
            cols[o] = pa.nulls(t.num_rows, rtypes[c])
        cols["side_"] = np.ones(t.num_rows, dtype=np.int8)
        cols["bucket"] = (key % num_buckets).astype(np.int64)
        return pa.table(cols)

    def prep_right(t: pa.Table) -> pa.Table:
        key = t.column(by).to_numpy().astype(np.int64)
        cols = {}
        for c in left_cols:
            if c == by:
                cols[c] = t.column(by)
            elif c == on:
                cols[c] = t.column(on)
            else:
                cols[c] = pa.nulls(t.num_rows, ltypes[c])
        for c, o in zip(payload, pay_out):
            cols[o] = t.column(c)
        cols["side_"] = np.zeros(t.num_rows, dtype=np.int8)
        cols["bucket"] = (key % num_buckets).astype(np.int64)
        # right's tie column must survive even if not in payload
        cols["rtie_"] = t.column(tie).to_numpy().astype(np.int64)
        return pa.table(cols)

    def prep_left_tie(t: pa.Table) -> pa.Table:
        out = prep_left(t)
        return out.append_column(
            "rtie_", pa.array(np.zeros(t.num_rows, dtype=np.int64)))

    unioned = (left.map_batches(prep_left_tie, batch_format="pyarrow")
               .union(right.map_batches(prep_right, batch_format="pyarrow")))

    out_cols = left_cols + pay_out

    def match(g: pd.DataFrame) -> pd.DataFrame:
        lmask = g["side_"].to_numpy() == 1
        lg = g.loc[lmask]
        rg = g.loc[~lmask]
        if not len(lg) or not len(rg):
            return pd.DataFrame({c: pd.Series([], dtype="object")
                                 for c in out_cols})
        # sort right by (by, on, tie): searchsorted side='right' on
        # (by-segment, on) then -1 lands on the max-(on, tie) match
        r_by = rg[by].astype("int64").to_numpy()
        r_on = _int_ns(rg[on])
        order = np.lexsort((rg["rtie_"].to_numpy(), r_on, r_by))
        rg = rg.iloc[order]
        r_by, r_on = r_by[order], r_on[order]
        seg = {}
        starts = np.nonzero(np.concatenate(
            ([True], r_by[1:] != r_by[:-1])))[0]
        ends = np.append(starts[1:], len(r_by))
        for s, e in zip(starts, ends):
            seg[r_by[s]] = (s, e)
        # iterate LEFT key segments (one searchsorted per key) so a
        # bucket with K keys costs K vector ops, not K full-left scans
        lord = np.argsort(lg[by].astype("int64").to_numpy(),
                          kind="stable")
        lg = lg.iloc[lord]
        l_by = lg[by].astype("int64").to_numpy()
        l_on = _int_ns(lg[on])
        lstarts = np.nonzero(np.concatenate(
            ([True], l_by[1:] != l_by[:-1])))[0]
        lends = np.append(lstarts[1:], len(l_by))
        idx = np.full(len(lg), -1, dtype=np.int64)
        for ls_, le_ in zip(lstarts, lends):
            se = seg.get(l_by[ls_])
            if se is None:
                continue
            s, e = se
            pos = s + np.searchsorted(r_on[s:e], l_on[ls_:le_],
                                      side="right") - 1
            pos[pos < s] = -1
            idx[ls_:le_] = pos
        ok = idx >= 0
        lg = lg.loc[ok]
        matched = rg.iloc[idx[ok]]
        out = {}
        for c in left_cols:
            vals = lg[c]
            if pa.types.is_integer(ltypes[c]):
                vals = vals.astype("int64")
            out[c] = vals.to_numpy()
        for c, o in zip(payload, pay_out):
            vals = matched[o]
            # union null-padding degraded ints to float64; restore
            if pa.types.is_integer(rtypes[c]):
                vals = vals.astype("int64")
            out[o] = vals.to_numpy()
        return pd.DataFrame(out)

    return unioned.groupby("bucket").map_groups(
        match, batch_format="pandas")


def range_join_agg(left, right, *, by, on, lo_us, hi_us, val_col,
                   left_schema=None,
                   n_name="n_matches", sum_name="sum_val",
                   num_buckets=64):
    """Range-join aggregate: for each left row, the COUNT and SUM of
    right ``val_col`` (int64) over right rows with the same ``by`` key
    and ``on`` in ``[left.on + lo_us, left.on + hi_us]`` (both bounds
    INCLUSIVE, offsets in microseconds).  Left rows with no match get
    0/0 — LEFT-join semantics, which keeps output row count equal to
    the left side (no null-dtype degradation to handle).

    One keyed shuffle; per-bucket cost is sort + two searchsorted per
    key segment + a cumsum (same kernel as the sliding window,
    pipelines/queries.py q_window_sliding_events).
    """
    ls = left.schema(fetch_if_missing=True) or left_schema
    left_cols = list(ls.names)
    ltypes = dict(zip(ls.names, ls.types))
    lo_ns, hi_ns = lo_us * 1000, hi_us * 1000

    def prep_left(t: pa.Table) -> pa.Table:
        key = t.column(by).to_numpy().astype(np.int64)
        cols = {c: t.column(c) for c in left_cols}
        cols["rval_"] = pa.nulls(t.num_rows, pa.int64())
        cols["side_"] = np.ones(t.num_rows, dtype=np.int8)
        cols["bucket"] = (key % num_buckets).astype(np.int64)
        return pa.table(cols)

    def prep_right(t: pa.Table) -> pa.Table:
        key = t.column(by).to_numpy().astype(np.int64)
        cols = {}
        for c in left_cols:
            if c == by:
                cols[c] = t.column(by)
            elif c == on:
                cols[c] = t.column(on)
            else:
                cols[c] = pa.nulls(t.num_rows, ltypes[c])
        cols["rval_"] = t.column(val_col).to_numpy().astype(np.int64)
        cols["side_"] = np.zeros(t.num_rows, dtype=np.int8)
        cols["bucket"] = (key % num_buckets).astype(np.int64)
        return pa.table(cols)

    unioned = (left.map_batches(prep_left, batch_format="pyarrow")
               .union(right.map_batches(prep_right, batch_format="pyarrow")))

    out_cols = left_cols + [n_name, sum_name]

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        lmask = g["side_"].to_numpy() == 1
        lg = g.loc[lmask]
        if not len(lg):
            return pd.DataFrame({c: pd.Series([], dtype="object")
                                 for c in out_cols})
        rg = g.loc[~lmask]
        n = np.zeros(len(lg), dtype=np.int64)
        s = np.zeros(len(lg), dtype=np.int64)
        if len(rg):
            r_by = rg[by].astype("int64").to_numpy()
            r_on = _int_ns(rg[on])
            rv = rg["rval_"].astype("int64").to_numpy()
            order = np.lexsort((r_on, r_by))
            r_by, r_on, rv = r_by[order], r_on[order], rv[order]
            csum = np.concatenate(([0], np.cumsum(rv)))
            starts = np.nonzero(np.concatenate(
                ([True], r_by[1:] != r_by[:-1])))[0]
            ends = np.append(starts[1:], len(r_by))
            seg = {r_by[st]: (st, e) for st, e in zip(starts, ends)}
            lord = np.argsort(lg[by].astype("int64").to_numpy(),
                              kind="stable")
            lg = lg.iloc[lord]
            n, s = n[lord], s[lord]
            l_by = lg[by].astype("int64").to_numpy()
            l_on = _int_ns(lg[on])
            lstarts = np.nonzero(np.concatenate(
                ([True], l_by[1:] != l_by[:-1])))[0]
            lends = np.append(lstarts[1:], len(l_by))
            for ls_, le_ in zip(lstarts, lends):
                se = seg.get(l_by[ls_])
                if se is None:
                    continue
                st, e = se
                son = r_on[st:e]
                lo = st + np.searchsorted(son, l_on[ls_:le_] + lo_ns,
                                          side="left")
                hi = st + np.searchsorted(son, l_on[ls_:le_] + hi_ns,
                                          side="right")
                n[ls_:le_] = hi - lo
                s[ls_:le_] = csum[hi] - csum[lo]
        out = {}
        for c in left_cols:
            vals = lg[c]
            if pa.types.is_integer(ltypes[c]):
                vals = vals.astype("int64")
            out[c] = vals.to_numpy()
        out[n_name] = n
        out[sum_name] = s
        return pd.DataFrame(out)

    return unioned.groupby("bucket").map_groups(
        agg, batch_format="pandas")
