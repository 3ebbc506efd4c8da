"""Distributed PageRank == single-process integer reference, exactly."""

import numpy as np
import pyarrow as pa


def test_pagerank_distributed_equals_reference(ray_session):
    import ray.data

    from hepcrawl_ray.ops import graph as G

    rng = np.random.default_rng(5)
    n_edges = 400
    src = rng.integers(0, 100, size=n_edges).astype(np.int64)
    dst = rng.integers(0, 120, size=n_edges).astype(np.int64)  # 100-119: dangling sinks
    t = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    eds = ray.data.from_arrow([t.slice(i, 100) for i in range(0, n_edges, 100)])
    out = G.pagerank(eds, iters=3, n_buckets=8).to_pandas()
    got = dict(zip(out["node"].astype(int), out["rank"].astype(int)))
    ref = G.pagerank_reference(src, dst, iters=3)
    assert got == ref          # integer fixed point: exact equality


def test_pagerank_mass_and_sink_behavior(ray_session):
    import ray.data

    from hepcrawl_ray.ops import graph as G

    # star graph: everyone points at node 0 -> node 0 dominates
    src = np.arange(1, 20, dtype=np.int64)
    dst = np.zeros(19, dtype=np.int64)
    eds = ray.data.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst)}))
    out = G.pagerank(eds, iters=4, n_buckets=4).to_pandas()
    ranks = dict(zip(out["node"].astype(int), out["rank"].astype(int)))
    assert ranks[0] == max(ranks.values())
    assert len(set(ranks[i] for i in range(1, 20))) == 1  # symmetric spokes
    ref = G.pagerank_reference(src, dst, iters=4)
    assert ranks == ref
