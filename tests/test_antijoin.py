"""Bloom-prefiltered anti-join: exact NOT IN regardless of bloom FPR,
with the false-positive sliver resolved by the keyed verify."""

import numpy as np
import pyarrow as pa
import pytest

from hepcrawl_ray.ops.antijoin import bloom_anti_join
from hepcrawl_ray.state.bloom import BloomFilter


def _ds(table):
    import ray

    return ray.data.from_arrow(table)


@pytest.mark.parametrize("fpr", [0.01, 0.5])
def test_exact_not_in_at_any_fpr(ray_session, fpr):
    """Even with an absurd 50% FPR (many candidates mis-flagged as
    'maybe done'), the verify phase restores the exact result."""
    cand = pa.table({"k": list(range(100)),
                     "name": [f"n{i}" for i in range(100)]})
    done = pa.table({"k": [i for i in range(100) if i % 3 == 0]})
    out = bloom_anti_join(_ds(cand), _ds(done), key_col="k",
                          fpr=fpr).to_pandas()
    assert sorted(out["k"]) == [i for i in range(100) if i % 3 != 0]
    assert out["k"].dtype == np.int64
    assert set(out.columns) == {"k", "name"}


def test_empty_done_set_passes_everything(ray_session):
    cand = pa.table({"k": [1, 2, 3], "name": ["a", "b", "c"]})
    done = pa.table({"k": pa.array([], pa.int64())})
    out = bloom_anti_join(_ds(cand), _ds(done), key_col="k").to_pandas()
    assert sorted(out["k"]) == [1, 2, 3]


def test_bloom_has_no_false_negatives():
    """The prefilter's safety property: a done key ALWAYS hits."""
    b = BloomFilter(capacity=1000, fpr=0.01)
    keys = np.arange(0, 5000, 5, dtype=np.int64)
    b.add_many(keys)
    assert b.contains_many(keys).all()
