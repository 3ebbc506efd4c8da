"""Temporal join operators (ops/temporal.py): as-of join and
range-join aggregate vs a brute-force reference, across bucket counts
and edge cases (ties, keys with no right rows, empty sides)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from hepcrawl_ray.ops import temporal as TJ


def _mk(rows, cols):
    return pa.table({c: pa.array(v) for c, v in zip(cols, rows)})


def _events(seed, n, n_users):
    rng = np.random.default_rng(seed)
    ts = np.sort(rng.integers(0, 10_000, n)).astype("datetime64[us]")
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(rng.integers(0, n_users, n).astype(np.int64)),
        "ts": pa.array(ts),
        "val": pa.array(rng.integers(0, 100, n).astype(np.int64)),
    })


def _to_ds(t, chunks=4):
    import ray

    n = max(1, t.num_rows // chunks)
    parts = [t.slice(i, n) for i in range(0, t.num_rows, n)]
    ds = ray.data.from_arrow(parts[0])
    for p in parts[1:]:
        ds = ds.union(ray.data.from_arrow(p))
    return ds


def _brute_asof(left, right):
    """Per left row: right row with max (ts, event_id) <= left ts."""
    out = []
    rdf = right.to_pandas()
    for _, lr in left.to_pandas().iterrows():
        cand = rdf[(rdf.user_id == lr.user_id) & (rdf.ts <= lr.ts)]
        if not len(cand):
            continue
        best = cand.sort_values(["ts", "event_id"]).iloc[-1]
        out.append((lr.event_id, lr.user_id, best.event_id, best.val))
    return sorted(out)


def _brute_range(left, right, lo_us, hi_us):
    out = []
    rdf = right.to_pandas()
    for _, lr in left.to_pandas().iterrows():
        lo = lr.ts + pd.Timedelta(microseconds=lo_us)
        hi = lr.ts + pd.Timedelta(microseconds=hi_us)
        cand = rdf[(rdf.user_id == lr.user_id)
                   & (rdf.ts >= lo) & (rdf.ts <= hi)]
        out.append((lr.event_id, int(len(cand)), int(cand.val.sum())))
    return sorted(out)


@pytest.mark.parametrize("num_buckets", [1, 7, 64])
def test_asof_matches_brute_force(ray_session, num_buckets):
    left = _events(1, 120, 9)
    right = _events(2, 80, 9)
    got = TJ.asof_join(_to_ds(left), _to_ds(right), by="user_id",
                       on="ts", tie="event_id",
                       payload=["event_id", "val"],
                       num_buckets=num_buckets).to_pandas()
    rows = sorted(zip(got.event_id.astype("int64"),
                      got.user_id.astype("int64"),
                      got.event_id_r.astype("int64"),
                      got.val_r.astype("int64")))
    assert rows == _brute_asof(left, right)


def test_asof_tie_breaks_to_max_event_id(ray_session):
    ts0 = np.datetime64("2024-01-01T00:00:00", "us")
    left = pa.table({"event_id": pa.array([100], pa.int64()),
                     "user_id": pa.array([5], pa.int64()),
                     "ts": pa.array([ts0 + 10])})
    # three right rows at the SAME timestamp: max event_id must win
    right = pa.table({"event_id": pa.array([1, 3, 2], pa.int64()),
                      "user_id": pa.array([5, 5, 5], pa.int64()),
                      "ts": pa.array([ts0, ts0, ts0]),
                      "val": pa.array([11, 33, 22], pa.int64())})
    got = TJ.asof_join(_to_ds(left, 1), _to_ds(right, 1), by="user_id",
                       on="ts", tie="event_id",
                       payload=["event_id", "val"]).to_pandas()
    assert len(got) == 1
    assert int(got.event_id_r.iloc[0]) == 3
    assert int(got.val_r.iloc[0]) == 33


def test_asof_inner_drops_unmatched_left(ray_session):
    ts0 = np.datetime64("2024-01-01T00:00:00", "us")
    left = pa.table({"event_id": pa.array([1, 2], pa.int64()),
                     "user_id": pa.array([1, 2], pa.int64()),
                     "ts": pa.array([ts0, ts0])})
    # user 2 has no right rows; user 1's right row is AFTER left ts
    right = pa.table({"event_id": pa.array([9], pa.int64()),
                      "user_id": pa.array([1], pa.int64()),
                      "ts": pa.array([ts0 + 1]),
                      "val": pa.array([7], pa.int64())})
    got = TJ.asof_join(_to_ds(left, 1), _to_ds(right, 1), by="user_id",
                       on="ts", tie="event_id",
                       payload=["event_id"]).to_pandas()
    assert len(got) == 0


@pytest.mark.parametrize("num_buckets", [1, 7, 64])
def test_range_agg_matches_brute_force(ray_session, num_buckets):
    left = _events(3, 100, 6)
    right = _events(4, 150, 6)
    got = TJ.range_join_agg(_to_ds(left), _to_ds(right), by="user_id",
                            on="ts", lo_us=-2000, hi_us=500,
                            val_col="val", num_buckets=num_buckets
                            ).to_pandas()
    rows = sorted(zip(got.event_id.astype("int64"),
                      got.n_matches.astype("int64"),
                      got.sum_val.astype("int64")))
    assert rows == _brute_range(left, right, -2000, 500)


def test_range_agg_left_semantics_zero_fill(ray_session):
    ts0 = np.datetime64("2024-01-01T00:00:00", "us")
    left = pa.table({"event_id": pa.array([1], pa.int64()),
                     "user_id": pa.array([42], pa.int64()),
                     "ts": pa.array([ts0])})
    right = pa.table({"event_id": pa.array([9], pa.int64()),
                      "user_id": pa.array([7], pa.int64()),
                      "ts": pa.array([ts0]),
                      "val": pa.array([5], pa.int64())})
    got = TJ.range_join_agg(_to_ds(left, 1), _to_ds(right, 1),
                            by="user_id", on="ts", lo_us=-1000,
                            hi_us=0, val_col="val").to_pandas()
    assert len(got) == 1
    assert int(got.n_matches.iloc[0]) == 0
    assert int(got.sum_val.iloc[0]) == 0
