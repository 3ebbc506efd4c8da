"""Materialized IVF index: partition-pruned probe reads + recall."""

import os

import numpy as np
import pytest

from hepcrawl_ray.ops import knn as K
from hepcrawl_ray.pipelines.queries import _read

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def index(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ivf"))
    ds = _read(SF, "embeddings", ["vec_id", "embedding"])
    cent = K.build_ivf_index(ds, d, n_centroids=8)
    return d, cent, ds


def test_index_layout_partitioned_by_bucket(index):
    d, cent, ds = index
    buckets = [f for f in os.listdir(d) if f.startswith("bucket=")]
    assert len(buckets) >= 2  # corpus spreads over several buckets
    assert os.path.exists(os.path.join(d, "centroids.npy"))
    saved = np.load(os.path.join(d, "centroids.npy"))
    assert np.array_equal(saved, cent)


def test_query_reads_only_probed_buckets_and_recall(index):
    d, cent, ds = index
    rows = ds.take_all()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    matn = mat / norms[:, None]

    # searchsorted needs sorted ids; take_all() block order is not
    # contractually sorted — sort explicitly
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    norms, matn = norms[order], matn[order]
    assert (np.diff(ids) > 0).all()

    q_idx = [0, 1, 2]
    q_vecs = mat[np.searchsorted(ids, q_idx)]
    out = K.knn_ivf_query(d, q_vecs, k=10, nprobe=4,
                          exclude_self_ids=q_idx).to_pandas()

    # exact top-10 per query for recall
    qn = q_vecs / np.linalg.norm(q_vecs, axis=1)[:, None]
    sims = qn @ matn.T
    total_recall = 0.0
    for qi in range(len(q_idx)):
        s = sims[qi].copy()
        s[np.searchsorted(ids, q_idx[qi])] = -np.inf
        exact = set(ids[np.argsort(-s)[:10]].tolist())
        got = set(out.loc[out["query_id"] == qi, "neighbor_id"])
        assert len(got) == 10
        total_recall += len(got & exact) / 10
    assert total_recall / len(q_idx) >= 0.7  # nprobe=4 of 8 buckets


def test_nprobe1_results_come_from_single_probed_bucket(index):
    """With nprobe=1 every returned neighbor must live in the query's
    single probed bucket — the end-to-end probe restriction."""
    d, cent, ds = index
    rows = ds.take_all()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    matn = mat / norms[:, None]
    bucket_of = dict(zip(ids.tolist(),
                         np.argmax(matn @ cent.T, axis=1).tolist()))

    q_vec = mat[np.searchsorted(ids, [5])]
    probe = int(np.argmax((q_vec / np.linalg.norm(q_vec)) @ cent.T))
    out = K.knn_ivf_query(d, q_vec, k=10, nprobe=1,
                          exclude_self_ids=[5]).to_pandas()
    assert len(out) > 0
    assert all(bucket_of[n] == probe for n in out["neighbor_id"])


def test_query_empty_probe_set(index, tmp_path):
    d, cent, ds = index
    # a query pointing at buckets that exist still returns; an index
    # with no matching partition dirs returns an empty typed result
    empty_dir = str(tmp_path / "empty_ivf")
    os.makedirs(empty_dir)
    np.save(os.path.join(empty_dir, "centroids.npy"), cent)
    ds_out = K.knn_ivf_query(empty_dir, np.ones((1, cent.shape[1])),
                             k=5, nprobe=2)
    assert ds_out.count() == 0
    assert ds_out.schema().names == ["query_id", "neighbor_id", "rank"]
