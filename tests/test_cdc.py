"""Gear-CDC chunking: vectorized == sequential, shift invariance,
chunk-level dedup statistics."""

import numpy as np
import pandas as pd
import pytest

from hepcrawl_ray.ops import cdc as C


def _rand_bytes(rng, n):
    return bytes(rng.integers(0, 256, n, dtype=np.uint8))


def test_gear_hashes_match_recurrence():
    rng = np.random.default_rng(5)
    data = _rand_bytes(rng, 500)
    got = C.gear_hashes(np.frombuffer(data, dtype=np.uint8))
    h = 0
    for i, b in enumerate(data):
        h = ((h << 1) + int(C.GEAR[b])) & 0xFFFFFFFFFFFFFFFF
        assert int(got[i]) == h


@pytest.mark.parametrize("n", [0, 1, 15, 64, 257, 5000])
def test_cut_points_vectorized_equals_reference(n):
    rng = np.random.default_rng(n + 1)
    data = _rand_bytes(rng, n)
    got = C.cut_points(data)
    want = C.cut_points_reference(data)
    assert got == want
    if n:
        assert got[-1] == n
        sizes = np.diff([0] + got)
        assert (sizes[:-1] >= 16).all() and (sizes <= 256).all()


def test_shift_invariance_of_interior_chunks():
    """Embedding the same payload after different prefixes must
    reproduce the payload's interior chunks — the CDC property."""
    rng = np.random.default_rng(9)
    payload = _rand_bytes(rng, 3000)
    chunks = set()
    for pre in (b"", _rand_bytes(rng, 137), _rand_bytes(rng, 901)):
        blob = pre + payload
        rows = C.chunk_rows(blob)
        chunks_this = {h for h, s in rows}
        chunks.add(frozenset(chunks_this))
    base = C.chunk_rows(payload)
    base_hashes = [h for h, s in base]
    # all interior payload chunks (drop the first 2 and last 1, which
    # may merge with the prefix / the tail) appear in every variant
    interior = set(base_hashes[2:-1])
    for variant in chunks:
        assert interior <= variant


def test_cdc_dedup_stats(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    base = "".join(chr(rng.integers(97, 123)) for _ in range(2000))
    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": [base, base, base + "tail", "x" * 500, None, ""],
    })
    ds = rd.from_pandas(docs).repartition(3)
    out = C.cdc_dedup_stats(ds, bytes_col="text")
    assert list(out.columns) == ["n_chunks", "n_unique_chunks",
                                 "bytes_total", "bytes_unique"]
    r = out.iloc[0]
    # three near-copies of base -> heavy chunk dedup
    assert r["n_chunks"] > r["n_unique_chunks"]
    assert r["bytes_total"] > r["bytes_unique"]
    # totals are exact: every non-null byte is in exactly one chunk
    assert r["bytes_total"] == 2000 * 3 + 4 + 500
    # order/partitioning independence
    out2 = C.cdc_dedup_stats(
        rd.from_pandas(docs.iloc[::-1].reset_index(drop=True)),
        bytes_col="text")
    assert out.equals(out2)
