"""Cuckoo hash map: int64 key -> int64 timestamp, exact + deletable.

The exact layer of the URL-seen set.  The reference's crawl-once
middleware stores ``key -> timestamp`` in sqlite and *re-admits* a
request whose source timestamp is newer than the stored one
(reference: hepcrawl/middlewares.py:134-155).  That value check needs
an exact, value-bearing, deletable structure — a plain Bloom filter
cannot express it — so each frontier partition pairs its Bloom filter
(fast vectorized negatives) with this cuckoo map (2 hash choices,
4-slot buckets, full 64-bit keys + 64-bit values; ~17 B/key).

All batch operations are vectorized: lookups gather both candidate
buckets with numpy; bulk inserts place whole key arrays per round
(first-free-slot with intra-batch conflict resolution), falling back
to per-key cuckoo eviction only for the handful of stragglers.  This
keeps the frontier's dedup stage off the Python-per-row path.
"""

from __future__ import annotations

import numpy as np

from hepcrawl_ray.state.bloom import _mix, _GOLDEN

_SLOTS = 4
_MAX_KICKS = 500
_MAX_LOAD = 0.84


def _as_u64(keys) -> np.ndarray:
    a = np.asarray(keys)
    if a.dtype == np.int64:
        return a.view(np.uint64)
    return a.astype(np.uint64)


class CuckooMap:
    def __init__(self, capacity: int = 1 << 16):
        nb = max(8, int(capacity / (_SLOTS * _MAX_LOAD)))
        self.nbuckets = 1 << (nb - 1).bit_length()
        self._alloc()
        self.size = 0
        self._rng_state = np.uint64(0x853C49E6748FEA9B)  # deterministic evictions

    def _alloc(self):
        self.keys = np.zeros((self.nbuckets, _SLOTS), dtype=np.uint64)
        self.vals = np.zeros((self.nbuckets, _SLOTS), dtype=np.int64)
        self.used = np.zeros((self.nbuckets, _SLOTS), dtype=bool)

    # -- hashing -----------------------------------------------------------

    def _buckets(self, keys_u64: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        mask = np.uint64(self.nbuckets - 1)
        h1 = _mix(keys_u64)
        h2 = _mix(h1 ^ _GOLDEN)
        return (h1 & mask).astype(np.int64), (h2 & mask).astype(np.int64)

    # -- vectorized lookup -------------------------------------------------

    def _locate(self, ku: np.ndarray):
        """(found, bucket, slot) per key — vectorized over both choices."""
        n = len(ku)
        found = np.zeros(n, dtype=bool)
        bout = np.zeros(n, dtype=np.int64)
        sout = np.zeros(n, dtype=np.int64)
        if n == 0:
            return found, bout, sout
        b1, b2 = self._buckets(ku)
        for b in (b1, b2):
            hit = (self.keys[b] == ku[:, None]) & self.used[b]
            any_hit = hit.any(axis=1) & ~found
            if any_hit.any():
                idx = np.nonzero(any_hit)[0]
                bout[idx] = b[idx]
                sout[idx] = hit[idx].argmax(axis=1)
                found[idx] = True
        return found, bout, sout

    def get_many(self, keys) -> tuple[np.ndarray, np.ndarray]:
        """(found: bool[n], values: int64[n]) for an int64 key array."""
        ku = _as_u64(keys)
        found, b, s = self._locate(ku)
        values = np.zeros(len(ku), dtype=np.int64)
        if found.any():
            idx = np.nonzero(found)[0]
            values[idx] = self.vals[b[idx], s[idx]]
        return found, values

    def contains_many(self, keys) -> np.ndarray:
        return self._locate(_as_u64(keys))[0]

    # -- vectorized mutation -------------------------------------------------

    def set_many(self, keys, values) -> None:
        """Upsert a batch.  Duplicate keys within the batch: last wins."""
        ku = _as_u64(keys)
        vals = np.asarray(values, dtype=np.int64)
        if len(ku) == 0:
            return
        # dedupe within batch, keeping the LAST occurrence
        uniq, last_idx = np.unique(ku[::-1], return_index=True)
        keep = len(ku) - 1 - last_idx
        ku, vals = ku[keep], vals[keep]
        found, b, s = self._locate(ku)
        if found.any():
            idx = np.nonzero(found)[0]
            self.vals[b[idx], s[idx]] = vals[idx]
        new = ~found
        if new.any():
            self._insert_new(ku[new], vals[new])

    def _ensure_capacity(self, extra: int) -> None:
        need = self.size + extra
        if need > _MAX_LOAD * self.nbuckets * _SLOTS:
            target = self.nbuckets * _SLOTS
            while need > _MAX_LOAD * target:
                target *= 2
            self._grow(target)

    def _insert_new(self, ku: np.ndarray, vals: np.ndarray) -> None:
        """Bulk-place keys known to be absent and unique within the batch."""
        self._ensure_capacity(len(ku))
        b1, b2 = self._buckets(ku)
        remaining = np.arange(len(ku))
        for rnd in range(24):
            if len(remaining) == 0:
                break
            b = (b1 if rnd % 2 == 0 else b2)[remaining]
            free = ~self.used[b]                     # (m, SLOTS)
            has_free = free.any(axis=1)
            slot = free.argmax(axis=1)
            lin = b * _SLOTS + slot
            # first-wins per (bucket, slot) within this round
            _, first = np.unique(lin, return_index=True)
            win = np.zeros(len(remaining), dtype=bool)
            win[first] = True
            win &= has_free
            if win.any():
                r = remaining[win]
                bw, sw = b[win], slot[win]
                self.keys[bw, sw] = ku[r]
                self.vals[bw, sw] = vals[r]
                self.used[bw, sw] = True
                self.size += len(r)
                remaining = remaining[~win]
            elif not has_free.any() and rnd >= 1:
                break  # both buckets full for everything left -> evict path
        for i in remaining.tolist():  # stragglers: classic cuckoo eviction
            self._set_one(ku[i], int(vals[i]), count_existing=False)

    def set(self, key: int, value: int) -> None:
        ku = np.int64(key).view(np.uint64)
        self._set_one(ku, value, count_existing=True)

    def _set_one(self, ku: np.uint64, value: int, count_existing: bool) -> None:
        arr = np.array([ku], dtype=np.uint64)
        if count_existing:
            found, b, s = self._locate(arr)
            if found[0]:
                self.vals[b[0], s[0]] = value
                return
        b1, b2 = self._buckets(arr)
        b1, b2 = int(b1[0]), int(b2[0])
        for b in (b1, b2):
            for s in range(_SLOTS):
                if not self.used[b, s]:
                    self.keys[b, s], self.vals[b, s], self.used[b, s] = ku, value, True
                    self.size += 1
                    return
        # cuckoo eviction with deterministic slot choice
        cur_k, cur_v, b = ku, np.int64(value), b1
        for _ in range(_MAX_KICKS):
            s = self._next_rand() % _SLOTS
            cur_k, self.keys[b, s] = self.keys[b, s], cur_k
            cur_v, self.vals[b, s] = self.vals[b, s], cur_v
            nb1, nb2 = self._buckets(np.array([cur_k], dtype=np.uint64))
            b = int(nb2[0]) if int(nb1[0]) == b else int(nb1[0])
            for s2 in range(_SLOTS):
                if not self.used[b, s2]:
                    self.keys[b, s2], self.vals[b, s2], self.used[b, s2] = cur_k, cur_v, True
                    self.size += 1
                    return
        # over-loaded: rebuild at 2x, then place the displaced item
        # (both paths below account for size themselves)
        self._grow(self.nbuckets * _SLOTS * 2)
        self._set_one(cur_k, int(cur_v), count_existing=False)

    def _next_rand(self) -> int:
        # xorshift64 — deterministic eviction choice, no global RNG
        x = int(self._rng_state)
        x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 7
        x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
        self._rng_state = np.uint64(x)
        return x

    def delete(self, key: int) -> bool:
        ku = np.int64(key).view(np.uint64)
        found, b, s = self._locate(np.array([ku], dtype=np.uint64))
        if found[0]:
            self.used[int(b[0]), int(s[0])] = False
            self.size -= 1
            return True
        return False

    def _grow(self, target_slots: int) -> None:
        old_keys, old_vals, old_used = self.keys, self.vals, self.used
        nb = max(self.nbuckets * 2, target_slots // _SLOTS)
        self.nbuckets = 1 << (nb - 1).bit_length()
        self._alloc()
        self.size = 0
        mask = old_used.ravel()
        ks = old_keys.ravel()[mask]
        vs = old_vals.ravel()[mask]
        if len(ks):
            self._insert_new(ks, vs)

    # -- serialization -----------------------------------------------------

    def to_bytes(self) -> bytes:
        import pickle

        return pickle.dumps(
            {"nbuckets": self.nbuckets, "size": self.size,
             "rng": int(self._rng_state), "keys": self.keys,
             "vals": self.vals, "used": self.used},
            protocol=pickle.HIGHEST_PROTOCOL,
        )

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CuckooMap":
        import pickle

        d = pickle.loads(blob)
        self = cls.__new__(cls)
        self.nbuckets = d["nbuckets"]
        self.size = d["size"]
        self._rng_state = np.uint64(d["rng"])
        self.keys, self.vals, self.used = d["keys"], d["vals"], d["used"]
        return self
