"""SeenSet = Bloom (fast negative) + CuckooMap (exact, timestamped).

Implements the reference crawl-once admission rule
(reference: hepcrawl/middlewares.py:134-155):

- key never seen                      -> admit, record timestamp
- key seen, stored_ts >= candidate_ts -> skip (already crawled, fresh)
- key seen, stored_ts <  candidate_ts -> re-admit, update timestamp
  (the source was modified since we crawled it)

One SeenSet per frontier partition; serializes into the partition
checkpoint.  The admission decision is batch-vectorized: the Bloom
filter resolves definite-negatives without touching the cuckoo map,
only "maybe seen" keys pay the exact lookup.
"""

from __future__ import annotations

import numpy as np

from hepcrawl_ray.state.bloom import BloomFilter
from hepcrawl_ray.state.cuckoo import CuckooMap


class SeenSet:
    def __init__(self, capacity: int = 1 << 16, fpr: float = 0.01):
        self.bloom = BloomFilter(capacity=capacity, fpr=fpr)
        # cuckoo sized to full capacity: an undersized map forces a
        # grow+rebuild in the middle of the first big seal
        self.cuckoo = CuckooMap(capacity=max(1024, capacity))

    def __len__(self) -> int:
        return self.cuckoo.size

    def admit_many(self, keys: np.ndarray, timestamps: np.ndarray) -> np.ndarray:
        """Boolean admit mask, applying the crawl-once rule in row order.

        Duplicate keys *within* the batch follow the same rule against
        the earlier row's recorded timestamp (the reference processes
        requests sequentially, so within-run duplicates are skipped —
        cf. the cross-set dedup at
        reference: hepcrawl/spiders/common/oaipmh_spider.py:216-227).
        """
        keys = np.asarray(keys, dtype=np.int64)
        timestamps = np.asarray(timestamps, dtype=np.int64)
        n = len(keys)
        admit = np.zeros(n, dtype=bool)
        if n == 0:
            return admit

        maybe = self.bloom.contains_many(keys)
        stored_found = np.zeros(n, dtype=bool)
        stored_ts = np.zeros(n, dtype=np.int64)
        if maybe.any():
            idx = np.nonzero(maybe)[0]
            f, v = self.cuckoo.get_many(keys[idx])
            stored_found[idx], stored_ts[idx] = f, v

        uniq, first_idx, counts = np.unique(keys, return_index=True, return_counts=True)
        if not (counts > 1).any():
            admit = ~stored_found | (stored_ts < timestamps)
        else:
            # Vectorized duplicate handling: group rows by key (stable
            # sort).  Keys whose duplicates all share one timestamp
            # behave like uniques (only the first occurrence can admit);
            # only keys with MIXED timestamps need the sequential rule.
            order = np.argsort(keys, kind="stable")
            ks, ts_sorted = keys[order], timestamps[order]
            starts = np.concatenate(([0], np.flatnonzero(np.diff(ks)) + 1))
            key_max = np.maximum.reduceat(ts_sorted, starts)
            key_min = np.minimum.reduceat(ts_sorted, starts)
            first_mask = np.zeros(n, dtype=bool)
            first_mask[order[starts]] = True
            admit = first_mask & (~stored_found | (stored_ts < timestamps))
            hetero = key_max != key_min
            if hetero.any():
                # sequential crawl-once rule, only over the mixed-ts rows
                key_is_hetero = np.zeros(len(starts), dtype=bool)
                key_is_hetero[hetero] = True
                row_key_idx = np.zeros(n, dtype=np.int64)
                row_key_idx[order] = np.repeat(
                    np.arange(len(starts)),
                    np.diff(np.concatenate((starts, [n]))))
                hmask = key_is_hetero[row_key_idx]
                idxs = np.nonzero(hmask)[0]
                local_ts: dict[int, int] = {}
                for i in idxs.tolist():
                    k, t = int(keys[i]), int(timestamps[i])
                    prev = local_ts.get(k)
                    if prev is None:
                        prev = int(stored_ts[i]) if stored_found[i] else None
                    admit[i] = prev is None or prev < t
                    if admit[i]:
                        local_ts[k] = t
        if admit.any():
            ak = keys[admit]
            self.bloom.add_many(ak)
            self.cuckoo.set_many(ak, timestamps[admit])
        return admit

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.int64)
        maybe = self.bloom.contains_many(keys)
        out = np.zeros(len(keys), dtype=bool)
        if maybe.any():
            idx = np.nonzero(maybe)[0]
            out[idx] = self.cuckoo.contains_many(keys[idx])
        return out

    def seen_keys(self) -> np.ndarray:
        """All seen keys (int64) — used by the seen-set equivalence oracle."""
        m = self.cuckoo.used.ravel()
        return self.cuckoo.keys.ravel()[m].view(np.int64)

    # -- serialization -----------------------------------------------------

    def to_bytes(self) -> bytes:
        import pickle

        return pickle.dumps(
            {"bloom": self.bloom.to_bytes(), "cuckoo": self.cuckoo.to_bytes()},
            protocol=pickle.HIGHEST_PROTOCOL,
        )

    @classmethod
    def from_bytes(cls, blob: bytes) -> "SeenSet":
        import pickle

        d = pickle.loads(blob)
        self = cls.__new__(cls)
        self.bloom = BloomFilter.from_bytes(d["bloom"])
        self.cuckoo = CuckooMap.from_bytes(d["cuckoo"])
        return self
