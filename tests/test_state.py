import numpy as np

from hepcrawl_ray.state import BloomFilter, CuckooMap, SeenSet

rng = np.random.default_rng(42)


class TestBloom:
    def test_no_false_negatives(self):
        bf = BloomFilter(capacity=10_000, fpr=0.01)
        keys = rng.integers(-(2**62), 2**62, size=5000, dtype=np.int64)
        bf.add_many(keys)
        assert bf.contains_many(keys).all()

    def test_fpr_bounded(self):
        bf = BloomFilter(capacity=10_000, fpr=0.01)
        keys = rng.integers(0, 2**62, size=10_000, dtype=np.int64)
        bf.add_many(keys)
        probe = rng.integers(-(2**62), -1, size=20_000, dtype=np.int64)
        fp = bf.contains_many(probe).mean()
        assert fp < 0.03

    def test_roundtrip(self):
        bf = BloomFilter(capacity=1000)
        keys = np.arange(500, dtype=np.int64) * 7919
        bf.add_many(keys)
        bf2 = BloomFilter.from_bytes(bf.to_bytes())
        assert bf2.contains_many(keys).all()
        assert bf2.m_bits == bf.m_bits and bf2.k == bf.k

    def test_empty(self):
        bf = BloomFilter(capacity=100)
        assert bf.contains_many(np.array([], dtype=np.int64)).shape == (0,)
        assert not bf.contains_many(np.array([123], dtype=np.int64))[0]


class TestCuckoo:
    def test_set_get_delete(self):
        cm = CuckooMap(capacity=1024)
        keys = rng.integers(-(2**62), 2**62, size=800, dtype=np.int64)
        keys = np.unique(keys)
        vals = np.arange(len(keys), dtype=np.int64)
        cm.set_many(keys, vals)
        found, got = cm.get_many(keys)
        assert found.all()
        assert (got == vals).all()
        assert cm.delete(int(keys[0]))
        assert not cm.delete(int(keys[0]))
        found, _ = cm.get_many(keys[:1])
        assert not found[0]

    def test_overwrite(self):
        cm = CuckooMap(capacity=64)
        cm.set(5, 10)
        cm.set(5, 99)
        found, v = cm.get_many(np.array([5], dtype=np.int64))
        assert found[0] and v[0] == 99
        assert cm.size == 1

    def test_grow_under_pressure(self):
        cm = CuckooMap(capacity=8)  # tiny — forces growth
        keys = np.unique(rng.integers(0, 2**62, size=5000, dtype=np.int64))
        cm.set_many(keys, keys)
        found, got = cm.get_many(keys)
        assert found.all() and (got == keys).all()

    def test_absent(self):
        cm = CuckooMap(capacity=128)
        cm.set_many(np.arange(50, dtype=np.int64), np.arange(50, dtype=np.int64))
        found, _ = cm.get_many(np.arange(100, 200, dtype=np.int64))
        assert not found.any()

    def test_roundtrip(self):
        cm = CuckooMap(capacity=256)
        keys = np.arange(200, dtype=np.int64) * 31 - 3000
        cm.set_many(keys, keys * 2)
        cm2 = CuckooMap.from_bytes(cm.to_bytes())
        found, got = cm2.get_many(keys)
        assert found.all() and (got == keys * 2).all()
        assert cm2.size == cm.size


class TestSeenSet:
    def test_crawl_once_rule(self):
        # reference semantics: hepcrawl/middlewares.py:134-155
        ss = SeenSet(capacity=4096)
        keys = np.array([1, 2, 3], dtype=np.int64)
        ts = np.array([100, 100, 100], dtype=np.int64)
        assert ss.admit_many(keys, ts).all()                     # new -> admit
        assert not ss.admit_many(keys, ts).any()                 # same ts -> skip
        assert not ss.admit_many(keys, ts - 1).any()             # older -> skip
        admit = ss.admit_many(keys, np.array([101, 100, 99], dtype=np.int64))
        assert admit.tolist() == [True, False, False]            # newer -> re-admit

    def test_within_batch_duplicates(self):
        ss = SeenSet(capacity=4096)
        keys = np.array([7, 7, 7, 8], dtype=np.int64)
        ts = np.array([10, 10, 11, 10], dtype=np.int64)
        admit = ss.admit_many(keys, ts)
        # first 7 admits, second skips (same ts), third re-admits (newer)
        assert admit.tolist() == [True, False, True, True]

    def test_seen_keys_roundtrip(self):
        ss = SeenSet(capacity=4096)
        keys = np.unique(rng.integers(-(2**62), 2**62, size=1000, dtype=np.int64))
        ss.admit_many(keys, np.full(len(keys), 5, dtype=np.int64))
        ss2 = SeenSet.from_bytes(ss.to_bytes())
        assert set(ss2.seen_keys().tolist()) == set(keys.tolist())
        assert not ss2.admit_many(keys, np.full(len(keys), 5, dtype=np.int64)).any()

    def test_scale_smoke(self):
        ss = SeenSet(capacity=200_000)
        keys = np.unique(rng.integers(-(2**62), 2**62, size=100_000, dtype=np.int64))
        ts = np.zeros(len(keys), dtype=np.int64)
        assert ss.admit_many(keys, ts).all()
        assert not ss.admit_many(keys, ts).any()
        assert len(ss) == len(keys)
