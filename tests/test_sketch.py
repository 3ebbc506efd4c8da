"""HyperLogLog sketch: accuracy, mergeability, serialization."""

import numpy as np
import pyarrow as pa
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


def test_embedding_lsh_recall(ray_session):
    """LSH near-dup candidates verified by exact cosine: precision is 1
    by construction; recall vs the brute-force result must be high."""
    import ray

    from hepcrawl_ray.ops.dedup import (embedding_lsh_neardup_pairs,
                                        embedding_neardup_pairs)

    ds = ray.data.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    exact = embedding_neardup_pairs(ds, threshold=0.4)
    exact_pairs = {(r["vec_a"], r["vec_b"]) for r in exact.take_all()}
    # sign-LSH collision prob per table = (1 - theta/pi)^planes; at
    # cos 0.4 (theta ~66deg) that needs few planes / many tables
    lsh = embedding_lsh_neardup_pairs(ds, threshold=0.4,
                                      n_planes=4, n_tables=16)
    lsh_pairs = {(r["vec_a"], r["vec_b"]) for r in lsh.take_all()}
    assert lsh_pairs <= exact_pairs            # precision 1 (verified)
    if exact_pairs:
        recall = len(lsh_pairs & exact_pairs) / len(exact_pairs)
        assert recall >= 0.7, f"recall {recall}"


def test_knn_ivf_recall(ray_session):
    """IVF approximate top-k: results are a subset of valid neighbors
    and overlap the exact top-k substantially at nprobe=8/16 centroids."""
    import ray

    from hepcrawl_ray.ops.knn import knn_bruteforce, knn_ivf

    ds = ray.data.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    queries = (0, 1, 2, 3, 4)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in knn_bruteforce(ds, queries, k=10).take_all()}
    approx = {(r["query_id"], r["neighbor_id"])
              for r in knn_ivf(ds, queries, k=10, n_centroids=16,
                               nprobe=8).take_all()}
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.6, f"IVF recall {recall}"


class TestCountMin:
    def test_overestimate_only_and_exact_when_sparse(self):
        from hepcrawl_ray.ops.sketch import CountMinSketch

        cm = CountMinSketch(width=1024, depth=4)
        keys = np.repeat(np.arange(20, dtype=np.int64), np.arange(1, 21))
        cm.add_many(keys)
        est = cm.estimate_many(np.arange(20, dtype=np.int64))
        true = np.arange(1, 21)
        assert (est >= true).all()          # CountMin never undercounts
        # sparse load (210 increments into 4x1024): collisions unlikely
        assert (est == true).sum() >= 18

    def test_merge_equals_single_pass(self):
        from hepcrawl_ray.ops.sketch import CountMinSketch

        rng = np.random.default_rng(5)
        keys = rng.integers(0, 100, size=5000).astype(np.int64)
        whole = CountMinSketch().add_many(keys)
        a = CountMinSketch().add_many(keys[:2500])
        b = CountMinSketch().add_many(keys[2500:])
        a.merge(b)
        assert np.array_equal(a.grid, whole.grid)

    def test_roundtrip_bytes(self):
        from hepcrawl_ray.ops.sketch import CountMinSketch

        cm = CountMinSketch().add_many(np.arange(100, dtype=np.int64))
        back = CountMinSketch.from_bytes(cm.to_bytes())
        assert np.array_equal(cm.grid, back.grid)

    def test_heavy_hitters_find_true_top(self, ray_session):
        import ray

        from hepcrawl_ray.ops.sketch import approx_heavy_hitters

        rng = np.random.default_rng(11)
        # zipf-ish: user u appears ~ (u+1)*(u+2) times for u in 0..49
        users = np.concatenate([
            np.full((u + 1) * (u + 2) // 4 + 1, u, dtype=np.int64)
            for u in range(50)])
        rng.shuffle(users)
        ds = ray.data.from_arrow(pa.table({"user_id": users})) \
            .map_batches(lambda t: t, batch_format="pyarrow",
                         batch_size=500)
        out = approx_heavy_hitters(ds, "user_id", k=5)
        got = out.column("user_id").to_pylist()
        assert set(got) == {49, 48, 47, 46, 45}   # the true top-5
        # estimates upper-bound true counts
        true = {u: (u + 1) * (u + 2) // 4 + 1 for u in range(50)}
        for u, e in zip(got, out.column("est_count").to_pylist()):
            assert e >= true[u]


class TestQuantileSketch:
    def _rank_err(self, data, sk, q):
        import numpy as np

        est = sk.quantile(q)
        true_rank = np.searchsorted(np.sort(data), est, side="right")
        return abs(true_rank / len(data) - q)

    def test_rank_error_bound(self):
        import numpy as np

        from hepcrawl_ray.ops.sketch import QuantileSketch

        rng = np.random.default_rng(3)
        data = rng.integers(0, 10_000_000, size=100_000)
        sk = QuantileSketch(k=256)
        for i in range(0, len(data), 4096):
            sk.add_many(data[i:i + 4096])
        for q in (0.01, 0.25, 0.5, 0.75, 0.99):
            assert self._rank_err(data, sk, q) < 0.01, q

    def test_merge_matches_error_bound(self):
        import numpy as np

        from hepcrawl_ray.ops.sketch import QuantileSketch

        rng = np.random.default_rng(7)
        # skewed data split across 8 "workers", merged pairwise
        data = (rng.pareto(2.0, size=80_000) * 1000).astype(np.int64)
        parts = np.array_split(data, 8)
        sks = [QuantileSketch(k=256).add_many(p) for p in parts]
        merged = sks[0]
        for s in sks[1:]:
            merged.merge(s)
        for q in (0.1, 0.5, 0.9):
            assert self._rank_err(data, merged, q) < 0.015, q

    def test_exact_when_small(self):
        import numpy as np

        from hepcrawl_ray.ops.sketch import QuantileSketch

        data = np.arange(100, dtype=np.int64)
        sk = QuantileSketch(k=256).add_many(data)
        # below capacity the sketch is exact: quantile_disc rule
        assert sk.quantile(0.5) == 49
        assert sk.quantile(0.25) == 24

    def test_roundtrip(self):
        import numpy as np

        from hepcrawl_ray.ops.sketch import QuantileSketch

        rng = np.random.default_rng(11)
        sk = QuantileSketch(k=64).add_many(
            rng.integers(0, 1000, size=5000))
        blob = sk.to_bytes()
        back = QuantileSketch.from_bytes(blob)
        for q in (0.2, 0.5, 0.8):
            assert back.quantile(q) == sk.quantile(q)


def test_approx_quantiles_dataset(ray_session):
    """Sketch quantiles of part prices stay within 2% rank error of the
    exact per-column values (the oracle-green exact twin)."""
    import numpy as np
    import pyarrow.parquet as pq

    from hepcrawl_ray.pipelines.queries import q_approx_quantiles_prices, _cents

    sf = "/root/testdata/sf0.001"
    out = q_approx_quantiles_prices(sf).to_pandas()
    assert list(out.columns) == ["q", "approx_value"]
    cents = np.sort(_cents(
        pq.read_table(f"{sf}/part.parquet", columns=["p_retailprice"])
        .column("p_retailprice").to_numpy()))
    for q, est in zip(out["q"], out["approx_value"]):
        rank = np.searchsorted(cents, est, side="right") / len(cents)
        assert abs(rank - q) < 0.02, (q, est)


def test_grouped_hll_error_bound(ray_session):
    from hepcrawl_ray.ops.sketch import approx_distinct_by_group
    from hepcrawl_ray.pipelines.queries import _read

    sf = "/root/testdata/sf0.001"
    ds = _read(sf, "events", ["event_type", "user_id"])
    est = approx_distinct_by_group(ds, "event_type", "user_id")

    exact = {}
    for r in _read(sf, "events", ["event_type", "user_id"]).take_all():
        exact.setdefault(r["event_type"], set()).add(r["user_id"])
    assert set(est) == set(exact)
    for k, s in exact.items():
        assert abs(est[k] - len(s)) / len(s) < 0.05


def test_grouped_hll_batch_split_invariant(ray_session):
    """Merging per-batch sketches must equal one-shot sketching —
    the mergeability contract the distributed fold relies on."""
    import numpy as np

    from hepcrawl_ray.ops.sketch import HyperLogLog

    rng = np.random.default_rng(7)
    vals = rng.integers(0, 5000, 20000)
    one = HyperLogLog(12).add_many(vals)
    a = HyperLogLog(12).add_many(vals[:9000])
    b = HyperLogLog(12).add_many(vals[9000:])
    assert a.merge(b).estimate() == one.estimate()


def test_grouped_kll_rank_error_vs_exact(ray_session):
    from hepcrawl_ray.ops.sketch import approx_quantiles_by_group
    from hepcrawl_ray.pipelines.queries import _read

    sf = "/root/testdata/sf0.001"
    est = approx_quantiles_by_group(
        _read(sf, "documents", ["source", "n_chars"]),
        "source", "n_chars", qs=(0.5, 0.9))

    import numpy as np
    vals = {}
    for r in _read(sf, "documents", ["source", "n_chars"]).take_all():
        vals.setdefault(r["source"], []).append(r["n_chars"])
    assert set(est) == set(vals)
    for k, v in vals.items():
        v = np.sort(np.asarray(v))
        for q in (0.5, 0.9):
            # rank error: the estimate's rank within the exact sorted
            # values must be within 5% of the target rank
            r = np.searchsorted(v, est[k][q], side="right")
            assert abs(r / len(v) - q) <= 0.05 + 1.0 / len(v)


def test_audience_overlap_error_bound(ray_session):
    from hepcrawl_ray.pipelines.queries import QUERIES, _read

    sf = "/root/testdata/sf0.001"
    out = QUERIES["approx_audience_overlap"](sf).to_pandas() \
        .set_index("metric")["estimate"]

    click, buy = set(), set()
    for r in _read(sf, "events", ["user_id", "event_type"]).take_all():
        if r["event_type"] == "click":
            click.add(r["user_id"])
        elif r["event_type"] == "purchase":
            buy.add(r["user_id"])
    # inclusion-exclusion compounds three estimates; allow 10% on the
    # intersection, 5% on the single-set estimates
    assert abs(out["clickers"] - len(click)) / len(click) < 0.05
    assert abs(out["purchasers"] - len(buy)) / len(buy) < 0.05
    assert abs(out["union"] - len(click | buy)) / len(click | buy) < 0.05
    inter = len(click & buy)
    assert abs(out["intersection"] - inter) / max(inter, 1) < 0.10
