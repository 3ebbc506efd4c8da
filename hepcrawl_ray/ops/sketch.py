"""Mergeable sketches: HyperLogLog distinct-count over Dataset columns.

The canonical mergeable-sketch pattern from the scale playbook: each
``map_batches`` call emits ONE serialized sketch per batch (tiny), and
a final reduce merges them — so a 100 TB distinct-count moves kilobytes
instead of shuffling every row.  (The reference has no sketches; its
metrics are exact in-memory lists, reference: hepcrawl/pipelines.py:
105-153.  At frontier scale, unique-host / unique-URL telemetry needs
this.)

HLL: standard 2^p registers, 64-bit hashing (blake2b via
ops.text.content_hash64 for strings / splitmix for ints), bias-corrected
estimate with linear counting for the low range.  Relative error
~1.04/sqrt(2^p) (~1.6% at p=12).
"""

from __future__ import annotations

import numpy as np

from hepcrawl_ray.state.bloom import _mix


class HyperLogLog:
    def __init__(self, p: int = 12):
        assert 4 <= p <= 18
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    @staticmethod
    def _hash_values(values) -> np.ndarray:
        a = np.asarray(values)
        if a.dtype.kind in ("i", "u"):
            return _mix(a.astype(np.uint64))
        from hepcrawl_ray.ops.text import content_hash64

        return content_hash64([str(v) for v in values]).view(np.uint64)

    def add_many(self, values) -> "HyperLogLog":
        h = self._hash_values(values)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of the remaining bits + 1, via bit length
        lz = np.zeros(len(h), dtype=np.uint8)
        r = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            mask = r < (np.uint64(1) << np.uint64(64 - shift))
            lz[mask] += shift
            r[mask] <<= np.uint64(shift)
        rank = lz + 1
        np.maximum.at(self.registers, idx, rank)
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        if est <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                est = m * np.log(m / zeros)  # linear counting
        return float(est)

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "HyperLogLog":
        self = cls(p=blob[0])
        self.registers = np.frombuffer(blob[1:], dtype=np.uint8).copy()
        return self


def approx_distinct(ds, column: str, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT column): one sketch per batch, merged
    on the driver (kilobytes, never a row shuffle)."""
    import pyarrow as pa

    def sketch_batch(t: pa.Table) -> pa.Table:
        hll = HyperLogLog(p).add_many(t.column(column).to_pylist())
        return pa.table({"sketch": pa.array([hll.to_bytes()], pa.binary())})

    merged = HyperLogLog(p)
    for row in ds.map_batches(sketch_batch, batch_format="pyarrow").take_all():
        merged.merge(HyperLogLog.from_bytes(row["sketch"]))
    return merged.estimate()


# ------------------------------------------------------------ CountMin ----

class CountMinSketch:
    """Count-Min sketch: d x w counter grid, per-row hashed increments.

    Mergeable (elementwise add); point estimate = min over rows, which
    can only OVERESTIMATE a true count (collisions add, never
    subtract) — the frequency-estimation twin of the HLL layer,
    standard heavy-hitter machinery for a stream too wide to count
    exactly (Cormode & Muthukrishnan's public construction).
    """

    _SEEDS = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
              0x165667B19E3779F9, 0x27D4EB2F165667C5)

    def __init__(self, width: int = 2048, depth: int = 4):
        assert depth <= len(self._SEEDS)
        self.width = width
        self.depth = depth
        self.grid = np.zeros((depth, width), dtype=np.int64)

    def _rows(self, keys: np.ndarray) -> np.ndarray:
        h = np.empty((self.depth, len(keys)), dtype=np.uint64)
        k = keys.view(np.uint64) if keys.dtype == np.int64 \
            else keys.astype(np.uint64)
        for d in range(self.depth):
            x = (k ^ np.uint64(self._SEEDS[d])) * np.uint64(0x9E3779B97F4A7C15)
            x ^= x >> np.uint64(29)
            x *= np.uint64(0xBF58476D1CE4E5B9)
            x ^= x >> np.uint64(32)
            h[d] = x % np.uint64(self.width)
        return h

    def add_many(self, keys: np.ndarray) -> "CountMinSketch":
        rows = self._rows(np.asarray(keys))
        for d in range(self.depth):
            np.add.at(self.grid[d], rows[d], 1)
        return self

    def estimate_many(self, keys: np.ndarray) -> np.ndarray:
        rows = self._rows(np.asarray(keys))
        ests = np.stack([self.grid[d][rows[d]] for d in range(self.depth)])
        return ests.min(axis=0)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert self.grid.shape == other.grid.shape
        self.grid += other.grid
        return self

    def to_bytes(self) -> bytes:
        return self.grid.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes, width: int = 2048,
                   depth: int = 4) -> "CountMinSketch":
        s = cls(width, depth)
        s.grid = np.frombuffer(blob, dtype=np.int64).reshape(
            depth, width).copy()
        return s


def approx_heavy_hitters(ds, column: str, k: int = 10, *,
                         width: int = 2048, depth: int = 4,
                         candidates_per_batch: int = 64):
    """Approximate top-k of ``column`` by count.

    Mergeable-sketch shape: each batch emits ONE CountMin sketch plus
    its local top candidates (kilobytes per batch — never a row
    shuffle); the driver merges sketches, unions candidates, and ranks
    them by merged estimate.  A true top-k value is always among the
    candidates if it is a local top in >= 1 batch (guaranteed when a
    heavy hitter is heavy everywhere; the standard sketch trade).
    Estimates can only overestimate, never undercount.
    """
    import pyarrow as pa

    def sketch_batch(t: pa.Table) -> pa.Table:
        keys = t.column(column).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cm = CountMinSketch(width, depth).add_many(keys)
        vals, counts = np.unique(keys, return_counts=True)
        top = vals[np.argsort(-counts)[:candidates_per_batch]]
        return pa.table({
            "sketch": pa.array([cm.to_bytes()], pa.binary()),
            "cands": pa.array([top.tolist()], pa.list_(pa.int64())),
        })

    merged = CountMinSketch(width, depth)
    cands: set[int] = set()
    for row in ds.map_batches(sketch_batch,
                              batch_format="pyarrow").take_all():
        merged.merge(CountMinSketch.from_bytes(row["sketch"], width, depth))
        cands.update(int(c) for c in row["cands"])
    cand_arr = np.array(sorted(cands), dtype=np.int64)
    est = merged.estimate_many(cand_arr)
    order = np.lexsort((cand_arr, -est))[:k]
    return pa.table({column: pa.array(cand_arr[order]),
                     "est_count": pa.array(est[order].astype(np.int64))})


# ------------------------------------------------------------- KLL-lite ---

class QuantileSketch:
    """Mergeable quantile sketch (KLL-style compacting sampler,
    Karnin/Lang/Liberty's public construction, simplified): level i
    holds at most ``k`` sorted values of weight 2^i; a full level
    compacts by keeping alternate values (parity alternates per
    compaction — DETERMINISTIC, trading KLL's randomized unbiasedness
    for reproducible tests).  Rank error is O(levels / k); with k=256
    observed error on 100k-row streams is well under 1% of rank.

    Merge = concatenate level-wise then recompact: the same kilobyte-
    per-batch reduce shape as the HLL/CountMin layers — a 100 TB
    quantile never sorts rows globally."""

    def __init__(self, k: int = 256):
        self.k = k
        self.levels: list[np.ndarray] = [np.empty(0, np.int64)]
        self._parity: list[int] = [0]

    def _compact(self, lvl: int) -> None:
        while len(self.levels[lvl]) > self.k:
            if lvl + 1 == len(self.levels):
                self.levels.append(np.empty(0, np.int64))
                self._parity.append(0)
            vals = np.sort(self.levels[lvl], kind="mergesort")
            keep = vals[self._parity[lvl]::2]
            self._parity[lvl] ^= 1
            self.levels[lvl] = np.empty(0, np.int64)
            self.levels[lvl + 1] = np.concatenate(
                [self.levels[lvl + 1], keep])
            lvl += 1

    def add_many(self, values) -> "QuantileSketch":
        v = np.asarray(values, dtype=np.int64)
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compact(0)
        return self

    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        assert self.k == other.k
        for i, vals in enumerate(other.levels):
            if i >= len(self.levels):
                self.levels.append(np.empty(0, np.int64))
                self._parity.append(0)
            self.levels[i] = np.concatenate([self.levels[i], vals])
        for i in range(len(self.levels)):
            self._compact(i)
        return self

    def quantile(self, q: float) -> int:
        vals = np.concatenate(self.levels)
        wts = np.concatenate(
            [np.full(len(lv), 1 << i, np.int64)
             for i, lv in enumerate(self.levels)])
        order = np.argsort(vals, kind="mergesort")
        vals, wts = vals[order], wts[order]
        cum = np.cumsum(wts)
        target = max(int(np.ceil(q * cum[-1])), 1)
        return int(vals[np.searchsorted(cum, target)])

    def to_bytes(self) -> bytes:
        import pickle

        return pickle.dumps(
            (self.k, [lv.tobytes() for lv in self.levels], self._parity))

    @classmethod
    def from_bytes(cls, blob: bytes) -> "QuantileSketch":
        import pickle

        k, raw, parity = pickle.loads(blob)
        s = cls(k)
        s.levels = [np.frombuffer(b, np.int64).copy() for b in raw]
        s._parity = list(parity)
        return s


def approx_quantiles(ds, column: str, qs=(0.25, 0.5, 0.75), *,
                     k: int = 256, transform=None):
    """Approximate quantiles of ``column``: one KLL sketch per batch,
    merged on the driver (kilobytes per batch — never a row shuffle,
    never a global sort).  ``transform`` maps the raw numpy column to
    int64 (default: plain cast)."""
    import pyarrow as pa

    def sketch_batch(t: pa.Table) -> pa.Table:
        raw = t.column(column).to_numpy(zero_copy_only=False)
        v = transform(raw) if transform else raw.astype(np.int64)
        s = QuantileSketch(k).add_many(v)
        return pa.table({"sketch": pa.array([s.to_bytes()], pa.binary())})

    merged = QuantileSketch(k)
    for row in ds.map_batches(sketch_batch,
                              batch_format="pyarrow").take_all():
        merged.merge(QuantileSketch.from_bytes(row["sketch"]))
    return pa.table({
        "q": pa.array(list(qs), pa.float64()),
        "approx_value": pa.array([merged.quantile(q) for q in qs],
                                 pa.int64())})


def approx_distinct_by_group(ds, group_col: str, value_col: str,
                             p: int = 12) -> dict:
    """Grouped approximate COUNT(DISTINCT value) — one HyperLogLog per
    (batch, group).  Groups are vocabulary-sized by contract (event
    types, languages, sources), so the merged driver state is
    |groups| kilobyte sketches and rows never shuffle; at 100 TB this
    replaces a |groups| × |values| exact distinct exchange with a
    byte-bounded fold."""
    import pandas as pd
    import pyarrow as pa

    def sketch_batch(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "k": t.column(group_col).to_pandas(),
            "v": t.column(value_col).to_pandas()})
        keys, blobs = [], []
        for k, g in df.groupby("k", sort=False):
            keys.append(k)
            blobs.append(HyperLogLog(p).add_many(g["v"]).to_bytes())
        return pa.table({"k": pa.array(keys, pa.string()),
                         "sketch": pa.array(blobs, pa.binary())})

    merged: dict = {}
    for row in ds.map_batches(sketch_batch,
                              batch_format="pyarrow").take_all():
        hll = merged.setdefault(row["k"], HyperLogLog(p))
        hll.merge(HyperLogLog.from_bytes(row["sketch"]))
    return {k: h.estimate() for k, h in merged.items()}


def approx_quantiles_by_group(ds, group_col: str, value_col: str,
                              qs=(0.5, 0.9), *, k: int = 256,
                              transform=None) -> dict:
    """Grouped approximate quantiles — one KLL sketch per (batch,
    group), merged per group on the driver.  Same contract as
    approx_distinct_by_group: groups are vocabulary-sized, so the
    merged state is |groups| kilobyte sketches and rows never
    shuffle (the grouped twin of the exact value-histogram
    percentile queries, for value domains too wide to histogram)."""
    import pandas as pd
    import pyarrow as pa

    def sketch_batch(t: pa.Table) -> pa.Table:
        import numpy as np

        raw = t.column(value_col).to_numpy(zero_copy_only=False)
        v = transform(raw) if transform else raw.astype(np.int64)
        df = pd.DataFrame({"k": t.column(group_col).to_pandas(),
                           "v": v})
        keys, blobs = [], []
        for key, g in df.groupby("k", sort=False):
            keys.append(key)
            blobs.append(QuantileSketch(k_param).add_many(
                g["v"].to_numpy()).to_bytes())
        return pa.table({"k": pa.array(keys, pa.string()),
                         "sketch": pa.array(blobs, pa.binary())})

    k_param = k
    merged: dict = {}
    for row in ds.map_batches(sketch_batch,
                              batch_format="pyarrow").take_all():
        s = merged.setdefault(row["k"], QuantileSketch(k_param))
        s.merge(QuantileSketch.from_bytes(row["sketch"]))
    return {key: {q: s.quantile(q) for q in qs}
            for key, s in merged.items()}
