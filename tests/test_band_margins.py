"""Float-band safety margins for the contrastive_negatives oracle.

q_contrastive_negatives filters on a hard cosine band
(sim >= 0.15 AND sim < 0.4) and ranks by sim DESC.  Cosine involves
sqrt/divide/sum whose last-ulp rounding can differ between numpy and
DuckDB (CLAUDE.md lesson 25: only a single exact-int division is
order-exact), so the oracle comparison is only sound if the DATA keeps
every similarity far from the band edges and keeps the ranking gaps
around the top-k boundary far above cross-engine rounding noise.

This test verifies that property of the generator at every SF the
oracle mirror runs (sf0.001 local suite, sf0.01 driver correctness,
sf0.1 bench inputs): cross-engine divergence is ~1e-15 relative; we
demand 1e-9 margins — six orders of magnitude of headroom.
"""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

QUERY_IDS = (0, 1, 2, 3, 4)   # _KNN_QUERIES in pipelines/queries.py
LO, HI, K = 0.15, 0.4, 10
MARGIN = 1e-9

SF_DIRS = [d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                       "/root/testdata/sf0.1")
           if os.path.exists(os.path.join(d, "embeddings.parquet"))]


def _sims(sf_dir):
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    df = t.to_pandas()
    df = df[df["embedding"].notna()]
    ids = df["vec_id"].to_numpy(dtype=np.int64)
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    qrows = {int(i): mat[np.nonzero(ids == i)[0][0]]
             for i in QUERY_IDS if (ids == i).any()}
    return ids, mat, qrows


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_band_edges_have_margin(sf_dir):
    ids, mat, qrows = _sims(sf_dir)
    for qid, qv in qrows.items():
        s = mat @ qv
        s = s[ids != qid]
        assert np.abs(s - LO).min() > MARGIN, \
            f"{sf_dir} q{qid}: a similarity sits on the {LO} band edge"
        assert np.abs(s - HI).min() > MARGIN, \
            f"{sf_dir} q{qid}: a similarity sits on the {HI} band edge"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_topk_ranking_gaps_have_margin(sf_dir):
    """Adjacent in-band sims through rank k+1 must be distinct by more
    than cross-engine rounding noise, or row_number() order could
    differ between the engine and DuckDB."""
    ids, mat, qrows = _sims(sf_dir)
    for qid, qv in qrows.items():
        s = mat @ qv
        s = s[ids != qid]
        band = np.sort(s[(s >= LO) & (s < HI)])[::-1]
        head = band[:K + 1]
        if len(head) < 2:
            continue
        gaps = head[:-1] - head[1:]
        assert gaps.min() > MARGIN, \
            f"{sf_dir} q{qid}: near-tie at the rank boundary " \
            f"(min gap {gaps.min():.3e})"
