"""Generic Hamming-ball pair operator over a precomputed int64
signature column (the image perceptual-hash dedup path): pigeonhole
banding is LOSSLESS for Hamming <= d, so the distributed op must equal
brute force exactly on arbitrary signatures."""

import numpy as np
import pyarrow as pa
import pytest

from hepcrawl_ray.ops import dedup as D
from hepcrawl_ray.pipelines.queries import _phash64_closed_form

MAX_D = 6
N = 400


def _signatures():
    """Planted clusters (the closed-form phash) plus adversarial rows:
    exact duplicates and a far-apart tail from a seeded RNG."""
    ids = np.arange(N, dtype=np.int64)
    sigs = _phash64_closed_form(ids)
    rng = np.random.default_rng(7)
    tail = rng.integers(0, 2**63 - 1, size=64, dtype=np.int64)
    sigs[-64:] = tail
    sigs[-1] = sigs[0]  # exact duplicate (distance 0)
    return ids, sigs


def _brute_force(ids, sigs):
    u = sigs.view(np.uint64)
    want = set()
    for i in range(len(ids)):
        x = u[i] ^ u[i + 1:]
        d = np.zeros(len(x), dtype=np.int64)
        for _ in range(64):
            d += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
        for off in np.nonzero(d <= MAX_D)[0]:
            j = i + 1 + off
            want.add((int(ids[i]), int(ids[j]), int(d[off])))
    return want


def test_hamming_pairs_exact_vs_brute_force(ray_session):
    import ray

    ids, sigs = _signatures()
    t = pa.table({"doc_id": ids, "sig": sigs})
    # several blocks so banding crosses block boundaries
    ds = ray.data.from_arrow([t.slice(i, 100) for i in range(0, N, 100)])
    out = D.hamming_neardup_pairs(ds, sig_col="sig",
                                  max_distance=MAX_D).take_all()
    got = {(r["doc_a"], r["doc_b"], r["distance"]) for r in out}
    assert len(got) == len(out)  # no duplicate pairs
    want = _brute_force(ids, sigs)
    assert want  # fixture must contain near pairs
    assert got == want
    assert (0, N - 1, 0) in got  # the planted exact duplicate


def test_max_bucket_guard_drops_oversized_groups(ray_session):
    import ray

    ids = np.arange(40, dtype=np.int64)
    sigs = np.zeros(40, dtype=np.int64)  # one giant identical group
    ds = ray.data.from_arrow(pa.table({"doc_id": ids, "sig": sigs}))
    out = D.hamming_neardup_pairs(ds, sig_col="sig", max_distance=2,
                                  max_bucket=8).take_all()
    assert out == []  # every band group exceeds max_bucket -> dropped
