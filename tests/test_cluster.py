"""Distributed k-means + SemDeDup invariants (ops/cluster.py).

- distributed Lloyd's == a single-process numpy reference run from the
  same deterministic init (same argmax/mean/renormalize steps);
- planted Gaussian clusters are recovered (purity);
- SemDeDup prunes planted near-duplicates, keeps singletons, and every
  duplicate chain's survivor is its lowest-centroid-sim member.
"""

import numpy as np
import pyarrow as pa
import pytest

from hepcrawl_ray.ops import cluster as C
from hepcrawl_ray.ops.knn import _normalize


def _planted(n_per=40, k=5, dim=16, noise=0.15, seed=7):
    rng = np.random.default_rng(seed)
    centers = _normalize(rng.normal(size=(k, dim)))
    rows, labels = [], []
    for c in range(k):
        pts = centers[c] + noise * rng.normal(size=(n_per, dim))
        rows.append(pts)
        labels.extend([c] * n_per)
    mat = np.concatenate(rows)
    ids = np.arange(len(mat), dtype=np.int64)
    return ids, mat, np.array(labels)


def _to_ds(ids, mat, chunks=4):
    import ray

    tables = []
    for part in np.array_split(np.arange(len(ids)), chunks):
        tables.append(pa.table({
            "vec_id": pa.array(ids[part]),
            "embedding": pa.array([list(map(float, mat[i]))
                                   for i in part],
                                  pa.list_(pa.float32()))}))
    return ray.data.from_arrow(tables)


def _reference_init(ids, m, k):
    """Mirror of _init_centroids: hash-spread pool + greedy k-center."""
    h = (ids * C._HASH_MULT) % (1 << 31)
    pool = m[np.argsort(h, kind="stable")[:max(8 * k, k)]]
    chosen = [0]
    best = pool @ pool[0]
    for _ in range(1, min(k, len(pool))):
        nxt = int(np.argmin(best))
        chosen.append(nxt)
        best = np.maximum(best, pool @ pool[nxt])
    return pool[chosen].copy()


def _reference_kmeans(ids, mat, k, iters):
    """Single-process mirror of kmeans_fit's math (same init rule)."""
    m = _normalize(mat.astype(np.float64))
    cent = _reference_init(ids, m, k)
    for _ in range(iters):
        sims = m @ cent.T
        assign = np.argmax(sims, axis=1)
        new = cent.copy()
        for c in range(k):
            sel = m[assign == c]
            if len(sel):
                new[c] = sel.sum(axis=0)
                new[c] /= np.linalg.norm(new[c])
        cent = new
    return cent


def test_kmeans_matches_single_process_reference(ray_session):
    ids, mat, _ = _planted()
    ds = _to_ds(ids, mat)
    cent, inertia = C.kmeans_fit(ds, k=5, iters=4)
    ref = _reference_kmeans(ids, mat, k=5, iters=4)
    assert np.allclose(cent, ref, atol=1e-9)
    # inertia non-increasing (allow float jitter)
    assert all(b <= a + 1e-9 for a, b in zip(inertia, inertia[1:]))


def test_kmeans_recovers_planted_clusters(ray_session):
    ids, mat, labels = _planted()
    ds = _to_ds(ids, mat)
    cent, _ = C.kmeans_fit(ds, k=5, iters=8)
    m = _normalize(mat.astype(np.float64))
    assign = np.argmax(m @ cent.T, axis=1)
    # purity: majority label per cluster
    correct = sum(np.bincount(labels[assign == c]).max()
                  for c in np.unique(assign))
    assert correct / len(labels) >= 0.9


def test_kmeans_partition_count_invariant(ray_session):
    ids, mat, _ = _planted()
    c1, _ = C.kmeans_fit(_to_ds(ids, mat, chunks=2), k=5, iters=3)
    c2, _ = C.kmeans_fit(_to_ds(ids, mat, chunks=7), k=5, iters=3)
    assert np.allclose(c1, c2, atol=1e-12)


@pytest.fixture(scope="module")
def semdedup_case(ray_session):
    ids, mat, labels = _planted(noise=0.25)
    rng = np.random.default_rng(11)
    # plant near-duplicates of rows 0..9 (ids 1000+i): tiny jitter
    dup_of = np.arange(10)
    dups = mat[dup_of] + 0.001 * rng.normal(size=(10, mat.shape[1]))
    all_ids = np.concatenate([ids, 1000 + dup_of])
    all_mat = np.concatenate([mat, dups])
    ds = _to_ds(all_ids, all_mat, chunks=5)
    cent, _ = C.kmeans_fit(ds, k=5, iters=6)
    out = C.semdedup(ds, cent, tau=0.95).to_pandas()
    return all_ids, all_mat, cent, out


def test_semdedup_prunes_planted_duplicates(semdedup_case):
    all_ids, all_mat, cent, out = semdedup_case
    keep = dict(zip(out["vec_id"], out["keep"]))
    m = _normalize(all_mat.astype(np.float64))
    for i in range(10):
        a, b = int(all_ids[i]), int(1000 + i)
        # the planted pair is ~identical: at most one survives
        # (both pruned is possible only via a third chain member)
        assert keep[a] + keep[b] <= 1, (a, b)


def test_semdedup_keep_rule_invariants(semdedup_case):
    all_ids, all_mat, cent, out = semdedup_case
    m = _normalize(all_mat.astype(np.float64))
    sims_c = m @ cent.T
    cluster = np.argmax(sims_c, axis=1)
    csim = sims_c[np.arange(len(m)), cluster]
    order = {int(v): i for i, v in enumerate(all_ids)}
    s = m @ m.T
    np.fill_diagonal(s, -2.0)
    for _, row in out.iterrows():
        i = order[int(row["vec_id"])]
        assert int(row["cluster"]) == int(cluster[i])
        same = np.nonzero(cluster == cluster[i])[0]
        nb = same[(s[i, same] >= 0.95)]
        better = [j for j in nb
                  if (csim[j] < csim[i]) or
                     (csim[j] == csim[i] and
                      all_ids[j] < all_ids[i])]
        assert bool(row["keep"]) == (len(better) == 0)


def test_semdedup_singletons_kept(semdedup_case):
    # rows with no >= tau neighbor anywhere must all be kept
    all_ids, all_mat, cent, out = semdedup_case
    m = _normalize(all_mat.astype(np.float64))
    s = m @ m.T
    np.fill_diagonal(s, -2.0)
    lonely = set(all_ids[(s < 0.95).all(axis=1)].tolist())
    kept = set(out[out["keep"] == 1]["vec_id"].tolist())
    assert lonely <= kept


def test_power_iteration_matches_numpy_eig(ray_session):
    rng = np.random.default_rng(21)
    # anisotropic cloud: strong direction along a planted axis
    d = 12
    axis = rng.normal(size=d)
    axis /= np.linalg.norm(axis)
    mat = (rng.normal(size=(300, 1)) * 3.0) @ axis[None, :] \
        + 0.3 * rng.normal(size=(300, d)) + 5.0
    ids = np.arange(300, dtype=np.int64)
    ds = _to_ds(ids, mat, chunks=5)
    v, lam = C.power_iteration_top_pc(ds, iters=30)
    cov = np.cov(mat.astype(np.float64).T, bias=True)
    w, vecs = np.linalg.eigh(cov)
    ref_v = vecs[:, -1]
    ref_lam = w[-1]
    assert abs(abs(float(v @ ref_v)) - 1.0) < 1e-4
    assert abs(lam - ref_lam) / ref_lam < 1e-4


def test_mean_vector_exact(ray_session):
    rng = np.random.default_rng(22)
    mat = rng.normal(size=(101, 7))
    ids = np.arange(101, dtype=np.int64)
    m, n = C.mean_vector(_to_ds(ids, mat, chunks=4))
    assert n == 101
    # float32 storage in the list column bounds the comparison
    assert np.allclose(m, mat.astype(np.float32).mean(axis=0),
                       atol=1e-5)


def test_cluster_balanced_sample_quota_and_determinism(ray_session):
    from hepcrawl_ray.pipelines.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    a = QUERIES["cluster_balanced_sample"](sf).to_pandas() \
        .sort_values(["cluster", "sample_rank"]).reset_index(drop=True)
    b = QUERIES["cluster_balanced_sample"](sf).to_pandas() \
        .sort_values(["cluster", "sample_rank"]).reset_index(drop=True)
    assert a.equals(b)                       # fully deterministic
    per = a.groupby("cluster")["vec_id"].count()
    assert (per <= 10).all() and per.sum() == len(a)
    assert a["vec_id"].is_unique             # one cluster per vector
    for _, g in a.groupby("cluster"):
        assert g["sample_rank"].tolist() == list(
            range(1, len(g) + 1))
