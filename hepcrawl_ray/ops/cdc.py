"""Content-defined chunking (gear-hash CDC) + chunk-level dedup.

The storage-dedup primitive behind every large-corpus snapshot /
delta system (public construction: gear hashing, Xia et al. FastCDC,
USENIX ATC 2016, simplified here to the single-mask gear cutter):
chunk boundaries come from the CONTENT (positions where a rolling
gear hash has its low bits zero), so inserting or editing bytes only
re-chunks the neighborhood of the edit — identical content embedded
at different offsets still yields identical interior chunks, and
chunk-hash dedup then measures (or removes) byte-level redundancy no
document-level dedup can see.

The gear recurrence h_i = (h_{i-1} << 1) + GEAR[b_i] means only the
last 64 bytes influence h (older contributions shift out of the 64-bit
word), so the rolling hash is EXACTLY a 64-tap correlation:
h_i = sum_{k=0..63} GEAR[b_{i-k}] << k.  That form vectorizes: 64
whole-array adds over the byte buffer (numpy C speed), no per-byte
Python.  Boundary selection (min/max chunk size, forced cuts) walks
only the sparse candidate list (~n / 2^mask_bits positions).

Exactness: the vectorized cutter equals the byte-at-a-time reference
on every input (tests/test_cdc.py), and chunking a batch of blobs
concatenated or separately gives identical chunks per blob.
"""

from __future__ import annotations

from hashlib import blake2b

import numpy as np
import pandas as pd
import pyarrow as pa

_WINDOW = 64


def _gear_table() -> np.ndarray:
    """Deterministic 256-entry gear table (splitmix64 over the byte
    value — fixed, engine-defined constants)."""
    x = (np.arange(256, dtype=np.uint64)
         + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


GEAR = _gear_table()


def gear_hashes(data: np.ndarray) -> np.ndarray:
    """Rolling gear hash at every position of a uint8 array —
    h[i] = sum_{k=0..min(i,63)} GEAR[data[i-k]] << k, i.e. the exact
    value the sequential recurrence h = (h << 1) + GEAR[b] produces.
    Vectorized as a 64-tap correlation."""
    n = len(data)
    g = GEAR[data]
    h = g.copy()
    for k in range(1, min(_WINDOW, n)):
        h[k:] += g[:-k] << np.uint64(k)
    return h


def _greedy_cuts(cand: np.ndarray, n: int, min_size: int,
                 max_size: int) -> list:
    """Greedy boundary selection over the sparse candidate offsets:
    first candidate >= start+min_size within start+max_size, else a
    forced cut at start+max_size; final partial chunk ends at n."""
    cuts, start = [], 0
    while start < n:
        lo, hi = start + min_size, start + max_size
        ci = int(np.searchsorted(cand, lo))
        if ci < len(cand) and cand[ci] <= hi and cand[ci] < n:
            cut = int(cand[ci])
        else:
            cut = min(hi, n)
        cuts.append(cut)
        start = cut
    return cuts


def cut_points(data: bytes, *, mask_bits: int = 6, min_size: int = 16,
               max_size: int = 256) -> list:
    """Chunk END offsets (exclusive) for one blob: cut after byte i
    when the GLOBAL rolling window hash has its low mask_bits zero,
    min/max size enforced greedily.

    Deliberately NO per-chunk hash reset (where FastCDC restarts h at
    each chunk): the window is purely positional, so a boundary
    depends only on the trailing 64 bytes — fully shift-invariant,
    which is the property chunk dedup wants, and what lets the hash
    vectorize as one whole-buffer correlation."""
    n = len(data)
    if n == 0:
        return []
    arr = np.frombuffer(data, dtype=np.uint8)
    h = gear_hashes(arr)
    mask = np.uint64((1 << mask_bits) - 1)
    cand = np.nonzero((h & mask) == 0)[0] + 1      # cut AFTER byte i
    return _greedy_cuts(cand, n, min_size, max_size)


def cut_points_reference(data: bytes, *, mask_bits: int = 6,
                         min_size: int = 16,
                         max_size: int = 256) -> list:
    """Byte-at-a-time twin of ``cut_points`` (the sequential gear
    recurrence, same global no-reset window) for the
    vectorized==sequential exactness test."""
    mask = (1 << mask_bits) - 1
    h, cand = 0, []
    for i, b in enumerate(data):
        h = ((h << 1) + int(GEAR[b])) & 0xFFFFFFFFFFFFFFFF
        if (h & mask) == 0:
            cand.append(i + 1)
    return _greedy_cuts(np.asarray(cand, dtype=np.int64), len(data),
                        min_size, max_size)


def chunk_rows(blob: bytes, **kw) -> list:
    """(chunk_hash64, size) per chunk of one blob."""
    out, start = [], 0
    for cut in cut_points(blob, **kw):
        h = int.from_bytes(
            blake2b(blob[start:cut], digest_size=8).digest(),
            "little") - (1 << 63)
        out.append((h, cut - start))
        start = cut
    return out


def cdc_dedup_stats(ds, *, bytes_col: str, mask_bits: int = 6,
                    min_size: int = 16, max_size: int = 256,
                    num_buckets: int = 64) -> pd.DataFrame:
    """Chunk-level dedup measurement over a binary/text column:
    one row (n_chunks, n_unique_chunks, bytes_total, bytes_unique).

    Per-batch: chunk every blob, PRE-AGGREGATE (chunk_hash -> size,
    count) so duplicate chunks inside a batch never ride the shuffle;
    one chunk-hash-keyed bucket exchange makes the distinct global;
    the combine is 4 integers.  Wait-free at 100 TB: chunk hashes are
    64-bit ints, payload bytes never leave the map stage."""

    def partial(t: pa.Table) -> pa.Table:
        hs, sz = [], []
        col = t.column(bytes_col)
        for v in col.to_pylist():
            if v is None:
                continue
            b = v.encode("utf-8") if isinstance(v, str) else bytes(v)
            for h, s in chunk_rows(b, mask_bits=mask_bits,
                                   min_size=min_size,
                                   max_size=max_size):
                hs.append(h)
                sz.append(s)
        if not hs:
            return pa.table({"h": pa.array([], pa.int64()),
                             "size": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "_bucket": pa.array([], pa.int64())})
        d = (pd.DataFrame({"h": np.array(hs, np.int64),
                           "size": np.array(sz, np.int64)})
             .groupby(["h", "size"], as_index=False)
             .agg(n=("h", "count")))
        return pa.table({
            "h": pa.array(d["h"].to_numpy(np.int64)),
            "size": pa.array(d["size"].to_numpy(np.int64)),
            "n": pa.array(d["n"].to_numpy(np.int64)),
            "_bucket": pa.array(d["h"].to_numpy(np.int64)
                                % num_buckets)})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        u = g.groupby(["h", "size"], as_index=False)["n"].sum()
        return pd.DataFrame({
            "n_chunks": [int(u["n"].sum())],
            "n_unique_chunks": [len(u)],
            "bytes_total": [int((u["size"] * u["n"]).sum())],
            "bytes_unique": [int(u["size"].sum())]})

    p = (ds.map_batches(partial, batch_format="pyarrow")
         .groupby("_bucket").map_groups(combine,
                                        batch_format="pandas")
         .to_pandas())
    cols = ["n_chunks", "n_unique_chunks", "bytes_total",
            "bytes_unique"]
    if p.shape[1] == 0:
        p = pd.DataFrame({c: [0] for c in cols})
    out = pd.DataFrame({c: [int(p[c].sum())] for c in cols})
    return out.astype("int64")
