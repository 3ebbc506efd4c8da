"""Adaptive dimension attach (ops/joinutil.attach_dim): both physical
plans must produce identical rows, and the size threshold must pick
the plan an optimizer would."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture()
def fact_and_dim(ray_session):
    import ray

    rng = np.random.RandomState(3)
    fact = pa.table({
        "k": rng.randint(0, 30, 200).astype(np.int64),
        "v": np.arange(200, dtype=np.int64)})
    # dim misses keys 25..29 -> inner join drops those fact rows
    dim = pa.table({
        "dk": np.arange(25, dtype=np.int64),
        "name": [f"d{i}" for i in range(25)],
        "w": (np.arange(25) * 10).astype(np.int64)})
    ds = ray.data.from_arrow([fact.slice(0, 100), fact.slice(100)])
    return ds, fact, dim


def _expected(fact: pa.Table, dim: pa.Table) -> pd.DataFrame:
    f = fact.to_pandas()
    d = dim.to_pandas().rename(columns={"dk": "k"})
    m = f.merge(d, on="k", how="inner")
    return m.sort_values(["v"]).reset_index(drop=True)


def _got(ds) -> pd.DataFrame:
    out = ds.to_pandas()
    for c in ("k", "v", "w"):
        out[c] = out[c].astype("int64")
    return out[["k", "v", "name", "w"]].sort_values(["v"]) \
        .reset_index(drop=True)


def test_broadcast_plan_selected_and_correct(fact_and_dim):
    from hepcrawl_ray.ops.joinutil import attach_dim

    ds, fact, dim = fact_and_dim
    out, strategy = attach_dim(ds, dim, "k", "dk", ["name", "w"])
    assert strategy == "broadcast"
    pd.testing.assert_frame_equal(_got(out), _expected(fact, dim))


def test_gather_plan_selected_and_correct(fact_and_dim):
    from hepcrawl_ray.ops.joinutil import attach_dim

    ds, fact, dim = fact_and_dim
    out, strategy = attach_dim(ds, dim, "k", "dk", ["name", "w"],
                               broadcast_rows=0)
    assert strategy == "gather"
    pd.testing.assert_frame_equal(_got(out), _expected(fact, dim))


def test_dataset_dimension_counts_for_strategy(fact_and_dim):
    import ray

    from hepcrawl_ray.ops.joinutil import attach_dim

    ds, fact, dim = fact_and_dim
    dim_ds = ray.data.from_arrow(dim)
    out, strategy = attach_dim(ds, dim_ds, "k", "dk", ["name", "w"],
                               broadcast_rows=100)
    assert strategy == "broadcast"
    pd.testing.assert_frame_equal(_got(out), _expected(fact, dim))
    out, strategy = attach_dim(ds, dim_ds, "k", "dk", ["name", "w"],
                               broadcast_rows=10)
    assert strategy == "gather"
    pd.testing.assert_frame_equal(_got(out), _expected(fact, dim))


def test_plans_agree_with_missing_and_duplicate_keys(fact_and_dim):
    from hepcrawl_ray.ops.joinutil import attach_dim

    ds, fact, dim = fact_and_dim
    a, _ = attach_dim(ds, dim, "k", "dk", ["name", "w"])
    b, _ = attach_dim(ds, dim, "k", "dk", ["name", "w"],
                      broadcast_rows=0)
    pd.testing.assert_frame_equal(_got(a), _got(b))


def test_empty_dataset_dimension_yields_typed_empty(fact_and_dim):
    """A dim Dataset whose prune matched NOTHING must not crash the
    broadcast collect (pa.concat_tables of zero batches) — the inner
    join result is an empty fact."""
    import pyarrow.compute as pc

    from hepcrawl_ray.ops.joinutil import attach_dim

    ds, fact, dim = fact_and_dim
    import ray
    dim_ds = (ray.data.from_arrow(dim)
              .map_batches(lambda t: t.filter(
                  pc.equal(t.column("dk"), -99999)),
                  batch_format="pyarrow"))
    out, strategy = attach_dim(ds, dim_ds, "k", "dk", ["name", "w"])
    assert strategy == "broadcast"
    got = out.to_pandas()
    assert len(got) == 0
    if len(got.columns):           # Ray may drop schema on all-empty
        assert {"name", "w"} <= set(got.columns)


def test_semi_join_empty_cols(fact_and_dim):
    """cols=[] is the semi-join shape (filter only, nothing attached)."""
    from hepcrawl_ray.ops.joinutil import attach_dim

    ds, fact, dim = fact_and_dim
    out, _ = attach_dim(ds, dim, "k", "dk", [])
    got = out.to_pandas()
    dks = set(dim.column("dk").to_pylist())
    want = fact.to_pandas()
    want = want[want["k"].isin(dks)]
    assert sorted(got["k"].astype("int64")) == sorted(want["k"])
