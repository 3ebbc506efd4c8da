"""Z-order layout: pruned range query == full-scan filter, and the
prune actually skips partitions."""

import numpy as np
import pandas as pd
import pytest

from hepcrawl_ray.ops import zorder as Z


def test_morton_interleave_known_values():
    cx = np.array([0, 1, 0, 1, 3], dtype=np.int64)
    cy = np.array([0, 0, 1, 1, 2], dtype=np.int64)
    # z = x bits at even positions, y bits at odd
    assert Z.morton_interleave(cx, cy, 4).tolist() == [0, 1, 2, 3, 13]


def test_cells_boundaries():
    v = np.array([0, 99, 100], dtype=np.int64)
    c = Z._cells(v, 0, 99, 2)          # span 100, 4 cells of 25
    assert c.tolist() == [0, 3, 3]      # out-of-range clips


@pytest.fixture(scope="module")
def layout(ray_session, tmp_path_factory):
    import ray.data as rd

    rng = np.random.default_rng(17)
    df = pd.DataFrame({
        "rid": np.arange(5000, dtype=np.int64),
        "x": rng.integers(0, 1000, 5000).astype(np.int64),
        "y": rng.integers(0, 1000, 5000).astype(np.int64),
    })
    d = str(tmp_path_factory.mktemp("zidx"))
    Z.zorder_layout(rd.from_pandas(df).repartition(8), d,
                    x_col="x", y_col="y", grid_bits=4, prefix_bits=3)
    return d, df


def test_range_query_equals_full_scan(ray_session, layout):
    d, df = layout
    for (xl, xh, yl, yh) in [(100, 250, 600, 900), (0, 999, 0, 999),
                             (500, 500, 0, 10), (990, 2000, -5, 3)]:
        res, nread, ntotal = Z.zorder_range_query(d, xl, xh, yl, yh)
        got_df = res.to_pandas() if res is not None else pd.DataFrame()
        # an all-empty filtered read loses its columns (Ray drops
        # empty map-output blocks) — that IS the empty result
        got = (sorted(got_df["rid"]) if "rid" in got_df.columns
               else [])
        want = sorted(df[(df.x >= xl) & (df.x <= xh)
                         & (df.y >= yl) & (df.y <= yh)]["rid"])
        assert got == want


def test_range_query_prunes_partitions(ray_session, layout):
    d, _ = layout
    res, nread, ntotal = Z.zorder_range_query(d, 100, 220, 600, 720)
    assert res is not None
    assert ntotal > 1
    assert nread < ntotal          # the whole point of the layout
    # a tiny rectangle touches very few quad blocks
    assert nread <= max(4, ntotal // 4)


def test_bucket_enumeration_covers_rect():
    meta = {"x_min": 0, "x_max": 15, "y_min": 0, "y_max": 15,
            "grid_bits": 4, "prefix_bits": 2, "x_col": "x",
            "y_col": "y"}
    # full plane -> all 16 quad blocks
    assert len(Z.zorder_buckets_for_rect(meta, 0, 15, 0, 15)) == 16
    # one cell -> exactly one block
    assert len(Z.zorder_buckets_for_rect(meta, 3, 3, 3, 3)) == 1
