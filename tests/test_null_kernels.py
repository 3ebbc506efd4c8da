"""NULL-payload contracts of the batch kernels (no Ray needed).

Real corpora carry rows whose text or embedding never materialized;
these tests pin the engine-wide semantics:

- text kernels: NULL text tokenizes to nothing (SQL unnest-of-NULL),
  per-doc stat kernels flag the row (null_mask) or emit SQL NULLs;
- dedup keys: all NULL texts share ONE fixed group key (SQL GROUP BY
  rule) that no real text collides with structurally;
- vectors: NULL embeddings are unindexed/unsearchable
  (ops/knn.drop_null_vectors), the convention of every vector index.
"""

import numpy as np
import pyarrow as pa

from hepcrawl_ray.ops import pii as P
from hepcrawl_ray.ops import text as T
from hepcrawl_ray.ops.knn import drop_null_vectors, list_column_to_matrix


def test_tokenize_and_shingles_null():
    assert T.tokenize_ws(None) == []
    assert T.shingles(None, 3) == []
    assert T.tokenize_ws("  a  b ") == ["a", "b"]


def test_token_stats_arrow_null_mask():
    col = pa.array(["a b", None, ""], pa.string())
    s = T.token_stats_arrow(col)
    assert s["null_mask"].tolist() == [False, True, False]
    # null rows compute as zero so filters can mask them either way
    assert s["n_tokens"].tolist() == [2, 0, 0]
    assert s["chars_no_ws"].tolist() == [2, 0, 0]


def test_bpe_token_count_null_is_zero():
    col = pa.array(["one two", None], pa.string())
    assert T.bpe_token_count(col).tolist() == [2, 0]


def test_content_hash_null_group_key():
    h = T.content_hash64(["x", None, None, ""])
    # the two NULLs share one key (SQL groups all NULLs together) ...
    assert h[1] == h[2]
    # ... that differs from both a real text and the empty string
    assert h[1] != h[0] and h[1] != h[3]


def test_fingerprint_null_sentinel_unreachable():
    fp = T.fingerprint64(["", None, "a"])
    # None is distinct from "" via the out-of-range (MOD, MOD) pack
    assert fp[1] != fp[0] and fp[1] != fp[2]
    mod = (1 << 31) - 1
    assert fp[1] == np.int64(np.uint64((mod << 31) | mod))


def test_langid_and_simhash_null():
    assert T.langid(["the cat and the dog", None])[1] == "und"
    assert T.simhash64([None])[0] == 0


def test_minhash_batch_drops_null_docs():
    a, b = T.minhash_params(8)
    idx, sig = T.minhash_batch(["w1 w2 w3 w4", None, "a b"], a, b, k=3)
    assert idx.tolist() == [0]          # null + sub-k docs shingle-less
    assert sig.shape == (1, 8)


def test_pii_counts_null_propagates():
    col = pa.array(["mail a@b.co", None], pa.string())
    counts = P.pii_counts(col)
    assert counts["n_emails"].to_pylist() == [1, None]
    assert P.redact(col).to_pylist()[1] is None


def test_drop_null_vectors_filters_and_matrix_builds():
    t = pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array([[1.0, 0.0], None, [0.0, 1.0]],
                              pa.list_(pa.float32())),
    })
    f = drop_null_vectors(t, "embedding")
    assert f.column("vec_id").to_pylist() == [0, 2]
    mat = list_column_to_matrix(f.column("embedding"))
    assert mat.shape == (2, 2)
