"""Z-order (Morton) 2-D data layout + range-query partition pruning.

The multi-dimensional twin of the IVF index layout (ops/knn.py): data
is written to parquet PARTITIONED BY a z-prefix bucket — cells of a
2^g x 2^g grid over (x, y), interleaved Morton-style so each bucket is
a contiguous quad block of the plane — and a 2-D range query reads
ONLY the buckets its rectangle touches (partition pruning at the
read), then applies the exact predicate to the survivors.  At 100 TB
that is the difference between scanning the table and scanning
rect-area/total-area of it; the classic public construction is Morton
1966 / the z-order curve used by every lakehouse layout optimizer.

All arithmetic is integer (cell edges come from an integer min/max
pass), so layout and query agree bit-for-bit on every boundary and the
result equals the plain full-scan filter exactly — which is what makes
the range query SQL-oracle-able (a BETWEEN twin).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

_META = "zorder_meta.json"


def morton_interleave(cx: np.ndarray, cy: np.ndarray,
                      bits: int) -> np.ndarray:
    """Interleave the low ``bits`` bits of cx (even positions) and cy
    (odd positions) into one z value.  Vectorized bit-twiddling."""
    z = np.zeros(len(cx), dtype=np.int64)
    cx = cx.astype(np.int64)
    cy = cy.astype(np.int64)
    for b in range(bits):
        z |= ((cx >> b) & 1) << (2 * b)
        z |= ((cy >> b) & 1) << (2 * b + 1)
    return z


def _cells(vals: np.ndarray, lo: int, hi: int, g: int) -> np.ndarray:
    """Uniform integer grid cell of each value: ((v - lo) << g) //
    span, clipped into [0, 2^g).  Integer-exact for int64 inputs."""
    span = int(hi) - int(lo) + 1
    c = ((vals.astype(np.int64) - int(lo)) << g) // span
    return np.clip(c, 0, (1 << g) - 1)


def zorder_layout(ds, index_dir: str, *, x_col: str, y_col: str,
                  grid_bits: int = 4, prefix_bits: int = 3) -> dict:
    """Write ``ds`` to ``index_dir`` partitioned by z-prefix bucket.

    ``grid_bits`` g: the plane is a 2^g x 2^g cell grid;
    ``prefix_bits`` p <= g: partitions are the top 2p bits of the
    Morton code — 4^p quad-block buckets, each covering a
    2^(g-p) x 2^(g-p) square of cells.  One tiny min/max aggregate
    pass fixes the integer cell edges (saved in the meta file); the
    layout pass itself is a row-local map + partitioned write — no
    shuffle at all.
    """
    from ray.data.aggregate import Max, Min

    agg = ds.aggregate(Min(x_col), Max(x_col), Min(y_col), Max(y_col))

    def _b(key):  # empty input -> degenerate [0, 0] grid
        v = (agg or {}).get(key)
        return int(v) if v is not None else 0

    meta = {"x_min": _b(f"min({x_col})"), "x_max": _b(f"max({x_col})"),
            "y_min": _b(f"min({y_col})"), "y_max": _b(f"max({y_col})"),
            "grid_bits": grid_bits, "prefix_bits": prefix_bits,
            "x_col": x_col, "y_col": y_col}
    shift = 2 * (grid_bits - prefix_bits)

    def add_bucket(t: pa.Table) -> pa.Table:
        x = t.column(x_col).to_numpy(zero_copy_only=False)
        y = t.column(y_col).to_numpy(zero_copy_only=False)
        cx = _cells(x, meta["x_min"], meta["x_max"], grid_bits)
        cy = _cells(y, meta["y_min"], meta["y_max"], grid_bits)
        z = morton_interleave(cx, cy, grid_bits)
        return t.append_column("zbucket", pa.array(z >> shift))

    os.makedirs(index_dir, exist_ok=True)
    (ds.map_batches(add_bucket, batch_format="pyarrow")
     .write_parquet(index_dir, partition_cols=["zbucket"]))
    with open(os.path.join(index_dir, _META), "w") as f:
        json.dump(meta, f)
    return meta


def zorder_buckets_for_rect(meta: dict, x_lo: int, x_hi: int,
                            y_lo: int, y_hi: int) -> list:
    """Z-prefix buckets intersecting the CLOSED rectangle
    [x_lo, x_hi] x [y_lo, y_hi] — the prune set.  Enumerates the
    rectangle's grid cells (cheap: cell counts, not rows) and folds
    them to their quad-block prefix."""
    g = meta["grid_bits"]
    shift = 2 * (g - meta["prefix_bits"])
    cx = _cells(np.array([x_lo, x_hi]), meta["x_min"], meta["x_max"], g)
    cy = _cells(np.array([y_lo, y_hi]), meta["y_min"], meta["y_max"], g)
    xs = np.arange(cx[0], cx[1] + 1, dtype=np.int64)
    ys = np.arange(cy[0], cy[1] + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys)
    z = morton_interleave(gx.ravel(), gy.ravel(), g)
    return sorted(set((z >> shift).tolist()))


def zorder_range_query(index_dir: str, x_lo: int, x_hi: int,
                       y_lo: int, y_hi: int):
    """2-D range query over a z-ordered layout: read ONLY the
    intersecting z-prefix partitions, then apply the exact closed-
    interval predicate.  Returns (dataset, n_buckets_read,
    n_buckets_total)."""
    import glob

    import pyarrow.compute as pc

    import ray

    with open(os.path.join(index_dir, _META)) as f:
        meta = json.load(f)
    want = set(zorder_buckets_for_rect(meta, x_lo, x_hi, y_lo, y_hi))
    part_dirs = sorted(glob.glob(os.path.join(index_dir, "zbucket=*")))
    picked = [d for d in part_dirs
              if int(os.path.basename(d).split("=")[1]) in want]
    x_col, y_col = meta["x_col"], meta["y_col"]

    def exact(t: pa.Table) -> pa.Table:
        x = t.column(x_col)
        y = t.column(y_col)
        m = pc.and_(
            pc.and_(pc.greater_equal(x, x_lo), pc.less_equal(x, x_hi)),
            pc.and_(pc.greater_equal(y, y_lo), pc.less_equal(y, y_hi)))
        return t.filter(m)

    files = []
    for d in picked:
        files.extend(sorted(glob.glob(os.path.join(d, "*.parquet"))))
    if not files:
        return None, len(picked), len(part_dirs)
    ds = ray.data.read_parquet(files).map_batches(
        exact, batch_format="pyarrow")
    return ds, len(picked), len(part_dirs)
