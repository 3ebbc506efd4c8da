"""HyperLogLog sketch: accuracy, mergeability, serialization."""

import numpy as np
import pytest

from hepcrawl_ray.ops.sketch import HyperLogLog, approx_distinct


class TestHLL:
    @pytest.mark.parametrize("n", [100, 5_000, 200_000])
    def test_accuracy_ints(self, n):
        hll = HyperLogLog(p=12)
        rng = np.random.default_rng(3)
        vals = rng.integers(0, 2**62, size=n, dtype=np.int64)
        hll.add_many(np.unique(vals))
        true = len(np.unique(vals))
        assert abs(hll.estimate() - true) / true < 0.05

    def test_accuracy_strings(self):
        hll = HyperLogLog(p=12)
        hll.add_many([f"url-{i}" for i in range(30_000)])
        assert abs(hll.estimate() - 30_000) / 30_000 < 0.05

    def test_duplicates_dont_inflate(self):
        hll = HyperLogLog(p=12)
        for _ in range(5):
            hll.add_many(list(range(1000)))
        assert abs(hll.estimate() - 1000) / 1000 < 0.05

    def test_merge_equals_union(self):
        a, b, u = HyperLogLog(12), HyperLogLog(12), HyperLogLog(12)
        xs = list(range(0, 20_000))
        ys = list(range(10_000, 30_000))
        a.add_many(xs)
        b.add_many(ys)
        u.add_many(sorted(set(xs) | set(ys)))
        a.merge(b)
        assert a.estimate() == pytest.approx(u.estimate())

    def test_roundtrip(self):
        hll = HyperLogLog(12).add_many(list(range(777)))
        again = HyperLogLog.from_bytes(hll.to_bytes())
        assert again.estimate() == pytest.approx(hll.estimate())


def test_approx_distinct_dataset(ray_session):
    import ray

    ds = ray.data.read_parquet("/root/testdata/sf0.001/events.parquet",
                               columns=["user_id"])
    est = approx_distinct(ds, "user_id")
    true = len(set(r["user_id"] for r in ds.take_all()))
    assert abs(est - true) / true < 0.05
