"""Product-quantization ANN: code compression, ADC recall, determinism."""

import numpy as np

from hepcrawl_ray.ops import knn as K
from hepcrawl_ray.pipelines.queries import _read

SF = "/root/testdata/sf0.001"
QIDS = [0, 1, 2, 3, 4]


def _exact_topk(ds, qids, k=10):
    rows = ds.take_all()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    matn = mat / norms[:, None]
    out = {}
    for q in qids:
        s = matn @ matn[np.searchsorted(ids, q)]
        s[np.searchsorted(ids, q)] = -np.inf
        out[q] = set(ids[np.argsort(-s)[:k]].tolist())
    return out


def test_codes_are_compact_uint8(ray_session):
    ds = _read(SF, "embeddings", ["vec_id", "embedding"])
    books = K.train_pq(ds, m=8, ks=16)
    assert books.shape == (8, 16, 8)  # dim 64 split 8 ways
    rows = ds.take(100)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1)[:, None]
    codes = K.pq_encode(mat, books)
    assert codes.shape == (100, 8) and codes.dtype == np.uint8
    assert codes.max() < 16                      # 4-bit codewords
    # 8 bytes/vector vs 64 float32s = 32x compression
    assert codes.nbytes * 32 == mat.astype(np.float32).nbytes


def test_pq_recall_vs_bruteforce(ray_session):
    ds = _read(SF, "embeddings", ["vec_id", "embedding"])
    got = K.knn_pq(ds, QIDS, k=10, m=8, ks=16, refine=4).to_pandas()
    exact = _exact_topk(ds, QIDS, k=10)
    recall = 0.0
    for q in QIDS:
        mine = set(got.loc[got["query_id"] == q, "neighbor_id"])
        assert len(mine) == 10
        assert q not in mine                     # self excluded
        recall += len(mine & exact[q]) / 10
    assert recall / len(QIDS) >= 0.7


def test_pq_deterministic(ray_session):
    ds = _read(SF, "embeddings", ["vec_id", "embedding"])
    a = (K.knn_pq(ds, QIDS, k=5).to_pandas()
         .sort_values(["query_id", "rank"]).reset_index(drop=True))
    b = (K.knn_pq(ds, QIDS, k=5).to_pandas()
         .sort_values(["query_id", "rank"]).reset_index(drop=True))
    assert a.equals(b)


def test_pq_query_registry(ray_session):
    from hepcrawl_ray.pipelines.queries import QUERIES

    out = QUERIES["knn_pq"](SF).to_pandas()
    assert len(out) == 50                        # 5 queries x top-10
    assert set(out.columns) == {"query_id", "neighbor_id", "rank"}


def test_sq8_roundtrip_error_bounded(ray_session):
    from hepcrawl_ray.ops import knn as K

    ds = _read(SF, "embeddings", ["vec_id", "embedding"])
    vmin, vmax = K.sq8_train(ds)
    assert len(vmin) == 64 and (vmax >= vmin).all()
    rows = ds.take(200)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    codes = K.sq8_encode(mat, vmin, vmax)
    assert codes.dtype == np.uint8
    assert codes.nbytes * 4 == mat.astype(np.float32).nbytes
    rec = K.sq8_decode(codes, vmin, vmax)
    # uniform quantization: error <= step/2 per element, per dim
    step = np.where(vmax > vmin, vmax - vmin, 1.0) / 255.0
    assert (np.abs(rec - mat) <= step / 2 + 1e-12).all()


def test_sq8_audit_query(ray_session):
    from hepcrawl_ray.pipelines.queries import QUERIES

    out = QUERIES["embedding_sq8_audit"](SF).to_pandas() \
        .set_index("metric")["value"]
    assert out["n_values"] > 0
    assert out["mean_abs_err_micro"] <= out["worst_step_micro"] / 2
    assert out["max_abs_err_micro"] <= out["worst_step_micro"] / 2 + 1
