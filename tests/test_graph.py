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


def test_kcore_distributed_equals_reference(ray_session):
    import ray

    from hepcrawl_ray.ops import graph as G

    rng = np.random.RandomState(11)
    # a dense clique (survives k=3) + a sparse tail (peels away)
    clique = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    tail = [(100 + i, 100 + i + 1) for i in range(20)]
    cross = [(0, 100), (1, 105), (2, 110)]
    rand = [(int(rng.randint(0, 40)), int(rng.randint(0, 40)))
            for _ in range(60)]
    src = np.array([e[0] for e in clique + tail + cross + rand])
    dst = np.array([e[1] for e in clique + tail + cross + rand])
    tbl = pa.table({"src": pa.array(src, pa.int64()),
                    "dst": pa.array(dst, pa.int64())})
    chunks = [tbl.slice(o, 16) for o in range(0, tbl.num_rows, 16)]
    got = G.kcore(ray.data.from_arrow(chunks), k=3)
    want = G.kcore_reference(src, dst, k=3)
    assert dict(zip(got["node"], got["degree"])) == want
    assert set(range(6)) <= set(got["node"])     # clique survives


def test_kcore_empty_when_overpruned(ray_session):
    import ray

    from hepcrawl_ray.ops import graph as G

    # a pure path graph has max core 1: k=2 peels everything
    src = np.arange(10, dtype=np.int64)
    dst = src + 1
    tbl = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    got = G.kcore(ray.data.from_arrow([tbl]), k=2)
    assert len(got) == 0
    assert list(got.columns) == ["node", "degree"]


def test_degree_histogram_matches_bincount(ray_session):
    import ray

    from hepcrawl_ray.ops import graph as G

    rng = np.random.RandomState(5)
    src = rng.randint(0, 50, 300).astype(np.int64)
    dst = rng.randint(0, 50, 300).astype(np.int64)
    tbl = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    chunks = [tbl.slice(o, 64) for o in range(0, tbl.num_rows, 64)]
    hist = (G.degree_histogram(ray.data.from_arrow(chunks))
            .to_pandas().groupby("degree", as_index=False)
            ["n_nodes"].sum())
    m = src != dst
    edges = set(zip(np.minimum(src[m], dst[m]).tolist(),
                    np.maximum(src[m], dst[m]).tolist()))
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    import collections
    want = collections.Counter(deg.values())
    got = dict(zip(hist["degree"].astype(int),
                   hist["n_nodes"].astype(int)))
    assert got == dict(want)


def test_bfs_distributed_equals_reference(ray_session):
    import ray

    from hepcrawl_ray.ops import graph as G

    rng = np.random.RandomState(11)
    src = rng.randint(0, 80, 200).astype(np.int64)
    dst = rng.randint(0, 80, 200).astype(np.int64)
    tbl = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    chunks = [tbl.slice(o, 32) for o in range(0, tbl.num_rows, 32)]
    got = G.bfs_hops(ray.data.from_arrow(chunks), sources=(0, 7),
                     max_hops=5)
    want = G.bfs_reference(src, dst, sources=(0, 7), max_hops=5)
    assert dict(zip(got["node"], got["dist"])) == want


def test_bfs_isolated_source_and_hop_cap(ray_session):
    import ray

    from hepcrawl_ray.ops import graph as G

    # path graph 1-2-3-4-5; source 999 is NOT in the edge list
    tbl = pa.table({"src": pa.array([1, 2, 3, 4], pa.int64()),
                    "dst": pa.array([2, 3, 4, 5], pa.int64())})
    got = G.bfs_hops(ray.data.from_arrow(tbl), sources=(1, 999),
                     max_hops=2)
    assert dict(zip(got["node"], got["dist"])) == {
        1: 0, 999: 0, 2: 1, 3: 2}
