"""Incremental LSH dedup against a materialized band index: the delta
run must equal the full LSH run restricted to pairs touching the new
batch, and must read only the probed index partitions."""

import numpy as np
import pandas as pd
import pytest

from hepcrawl_ray.ops import dedup as D


def _docs(rows):
    return pd.DataFrame(rows, columns=["doc_id", "text"])


@pytest.fixture(scope="module")
def corpus_and_new():
    rng = np.random.default_rng(33)
    words = [f"w{i}" for i in range(40)]

    def sent(n, seed_words=None):
        toks = list(seed_words or [])
        toks += [words[i] for i in rng.integers(0, 40, n)]
        return " ".join(toks)

    corpus = [(i, sent(12)) for i in range(60)]
    # a near-dup of corpus doc 7 (same text + one extra token)
    near_of_7 = corpus[7][1] + " extra"
    new = [(100, near_of_7),
           (101, "aa bb cc dd ee ff gg hh"),
           (102, "aa bb cc dd ee ff gg zz"),   # near-dup of 101
           (103, sent(12))]                     # unrelated
    return _docs(corpus), _docs(new)


def test_incremental_equals_full_restricted(ray_session, tmp_path,
                                            corpus_and_new):
    import ray.data as rd

    corpus_df, new_df = corpus_and_new
    corpus = rd.from_pandas(corpus_df).repartition(4)
    new = rd.from_pandas(new_df)
    idx = str(tmp_path / "bandidx")
    D.build_minhash_band_index(corpus, idx, num_perm=32, bands=8,
                               k_shingle=2)

    pairs_ds, nread, ntotal = D.incremental_neardup_pairs(
        idx, new, corpus, threshold=0.5, max_bucket=64)
    got = pairs_ds.to_pandas()
    got_set = (set(zip(got["doc_a"], got["doc_b"]))
               if "doc_a" in got.columns else set())

    # full LSH over corpus+new with the SAME params, restricted to
    # pairs touching the new batch
    both = rd.from_pandas(pd.concat([corpus_df, new_df],
                                    ignore_index=True)).repartition(4)
    full = D.minhash_lsh_pairs(both, num_perm=32, bands=8, k_shingle=2,
                               threshold=0.5).to_pandas()
    new_ids = set(new_df["doc_id"])
    want = {(a, b) for a, b in zip(full["doc_a"], full["doc_b"])
            if a in new_ids or b in new_ids}
    assert got_set == want
    # the planted dups are actually found
    assert (7, 100) in got_set and (101, 102) in got_set

    # delta probing must prune: a 4-doc batch touches few partitions
    assert ntotal > nread > 0


def test_incremental_empty_new_batch(ray_session, tmp_path,
                                     corpus_and_new):
    import pyarrow as pa
    import ray.data as rd

    corpus_df, _ = corpus_and_new
    corpus = rd.from_pandas(corpus_df).repartition(4)
    idx = str(tmp_path / "bandidx2")
    D.build_minhash_band_index(corpus, idx, num_perm=32, bands=8,
                               k_shingle=2)
    empty = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())}))
    pairs_ds, nread, ntotal = D.incremental_neardup_pairs(
        idx, empty, corpus, threshold=0.5)
    assert len(pairs_ds.to_pandas()) == 0
    assert nread == 0 and ntotal > 0
