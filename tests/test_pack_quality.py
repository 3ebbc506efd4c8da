"""Sequence packing + model-quality-gate invariants."""

import numpy as np
import pyarrow as pa

from hepcrawl_ray.pipelines.queries import (_PACK_BLOCK,
                                            _QualityModelStage,
                                            q_pack_sequences)

SF = "/root/testdata/sf0.001"


def test_pack_sequences_span_invariants(ray_session):
    out = q_pack_sequences(SF).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert (out["end_blk"] >= out["start_blk"]).all()
    # concat-and-chunk: consecutive docs touch the same or next block,
    # and token spans reconstruct the global running offset exactly
    before = np.concatenate([[0], out["n_tokens"].cumsum()[:-1]])
    assert (out["start_blk"] == before // _PACK_BLOCK).all()
    assert (out["end_blk"] ==
            (before + out["n_tokens"] - 1) // _PACK_BLOCK).all()
    # every block index up to the last is covered by some doc span
    total = int(out["n_tokens"].sum())
    assert int(out["end_blk"].max()) == (total - 1) // _PACK_BLOCK


def test_quality_model_batching_invariant():
    stage = _QualityModelStage()
    t = pa.table({
        "doc_id": pa.array(list(range(7)), pa.int64()),
        "text": pa.array([
            "the quick brown fox", "", "lorem ipsum dolor sit amet",
            "a a a a a a", "training data quality matters a lot",
            "zzz", "mixed CASE Tokens Here"])})
    whole = stage(t).to_pylist()
    single = [stage(t.slice(i, 1)).to_pylist()[0] for i in range(7)]
    assert whole == single
    fresh = _QualityModelStage()(t).to_pylist()
    assert whole == fresh
    assert all(0 <= r["quality_milli"] <= 1000 for r in whole)
    assert all(r["keep"] in (0, 1) for r in whole)
