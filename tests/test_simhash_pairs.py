"""SimHash near-pair operator: pigeonhole banding is LOSSLESS for
Hamming <= d, so the distributed op must equal brute force exactly."""

import numpy as np
import pytest

from hepcrawl_ray.ops import dedup as D
from hepcrawl_ray.ops import text as T
from hepcrawl_ray.pipelines.queries import _read

SF = "/root/testdata/sf0.001"
MAX_D = 6


def _brute_force_pairs():
    import ray  # noqa: F401  (session fixture owns the init)

    rows = _read(SF, "documents", ["doc_id", "text"]).take_all()
    ids = np.array([r["doc_id"] for r in rows], dtype=np.int64)
    sigs = T.simhash64([r["text"] for r in rows]).view(np.uint64)
    want = set()
    for i in range(len(ids)):
        x = sigs[i] ^ sigs[i + 1:]
        d = np.zeros(len(x), dtype=np.int64)
        for _ in range(64):
            d += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
        for off in np.nonzero(d <= MAX_D)[0]:
            j = i + 1 + off
            a, b = int(ids[i]), int(ids[j])
            want.add((min(a, b), max(a, b), int(d[off])))
    return want


@pytest.fixture(scope="module")
def brute(ray_session):
    return _brute_force_pairs()


def test_simhash_pairs_exact_vs_brute_force(ray_session, brute):
    out = D.simhash_neardup_pairs(
        _read(SF, "documents", ["doc_id", "text"]),
        max_distance=MAX_D).take_all()
    got = {(r["doc_a"], r["doc_b"], r["distance"]) for r in out}
    assert len(got) == len(out)  # no duplicate pairs
    assert got == brute


def test_simhash_pairs_distance_bounded(ray_session, brute):
    assert brute  # corpus must actually contain near pairs
    assert all(d <= MAX_D for _, _, d in brute)
