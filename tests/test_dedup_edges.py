"""Edge semantics of the dedup operators: shingle-less documents must
produce NO near-dup pairs in any text path (engine == SQL oracle,
which has no shingles to join on), and the pair operators must agree
with each other on a mixed corpus."""

import pyarrow as pa

from hepcrawl_ray.ops import dedup as D
from hepcrawl_ray.ops import text as T


def _docs():
    import ray

    rows = pa.table({
        "doc_id": list(range(8)),
        "text": [
            "a b",                       # < k tokens: shingle-less
            "x y",                       # < k tokens: shingle-less
            "",                          # empty
            "one two three four five",   # real text A
            "one two three four five",   # exact dup of A
            "one two three four six",    # near dup of A
            "totally different words here now",
            "w",                         # single token
        ],
    })
    return ray.data.from_arrow(rows)


def test_shingles_short_text_empty():
    assert T.shingles("a b", 3) == []
    assert T.shingles("", 3) == []
    assert T.shingles("a b c", 3) == ["a b c"]


def test_jaccard_shingleless_is_zero():
    assert T.jaccard_tokens("a b", "a b", 3) == 0.0
    assert T.jaccard_tokens("", "", 3) == 0.0
    assert T.jaccard_tokens("one two three", "one two three", 3) == 1.0


def test_ngram_pairs_skip_shingleless(ray_session):
    out = D.ngram_jaccard_pairs(_docs(), k_shingle=3, threshold=0.3)
    pairs = {(r["doc_a"], r["doc_b"]) for r in out.take_all()}
    # only the real texts pair up; no short-doc pair appears
    assert (3, 4) in pairs
    assert all(a >= 3 and b >= 3 for a, b in pairs)


def test_minhash_pairs_skip_shingleless(ray_session):
    out = D.minhash_lsh_pairs(_docs(), num_perm=32, bands=8, threshold=0.3)
    pairs = {(r["doc_a"], r["doc_b"]) for r in out.take_all()}
    assert (3, 4) in pairs  # exact dup always collides + verifies
    assert all(a >= 3 and b >= 3 for a, b in pairs)


def test_minhash_subset_of_ngram(ray_session):
    """LSH candidates are verified by exact Jaccard, so minhash pairs
    are a subset of the exact blocked result at the same threshold."""
    exact = {(r["doc_a"], r["doc_b"]) for r in D.ngram_jaccard_pairs(
        _docs(), k_shingle=3, threshold=0.3).take_all()}
    lsh = {(r["doc_a"], r["doc_b"]) for r in D.minhash_lsh_pairs(
        _docs(), num_perm=32, bands=8, threshold=0.3).take_all()}
    assert lsh <= exact


def test_minhash_batch_matches_reference():
    """The batch kernel must agree signature-for-signature with the
    per-document reference implementation."""
    import numpy as np

    a, b = T.minhash_params(32)
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "",                      # shingle-less (empty)
        "one two",               # shingle-less (< k tokens)
        "alpha beta gamma",      # exactly k tokens -> 1 shingle
        "  padded   tokens \t with   odd whitespace  runs here ",
        "the quick brown fox jumps over the lazy dog",  # duplicate
    ]
    doc_idx, sig = T.minhash_batch(texts, a, b, k=3)
    assert doc_idx.tolist() == [0, 3, 4, 5]
    for row, d in enumerate(doc_idx):
        ref = T.minhash_signature(texts[d], a, b, k=3)
        assert np.array_equal(sig[row], ref), f"doc {d} diverged"
    # identical texts -> identical signatures and band digests
    bd = T.band_digests(sig, bands=8)
    assert np.array_equal(sig[0], sig[3])          # rows 0 and 3 = docs 0, 5
    assert np.array_equal(bd[0], bd[3])


def test_shingle_explode_matches_reference():
    """The vectorized batch explode (Arrow split + windowed join)
    must yield exactly the strings the per-doc reference produces,
    in document order, across empty / NULL / short / padded texts
    and for several k."""
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "", None, "one two", "alpha beta gamma",
        "  padded   tokens \t with   odd whitespace  runs here ",
        "w1 w2 w3 w1 w2 w3",
        # NON-ASCII whitespace: \v, NBSP and U+2028 are NOT RE2 \s —
        # they stay inside tokens on BOTH sides (the scalar tokenizer
        # is pinned to RE2 semantics; r5 review finding)
        "a\x0bb c d e", "x\xa0y z w v", "p q r s t",
    ]
    for k in (1, 2, 3, 5):
        di, sh = T.shingle_explode(texts, k)
        got: dict[int, list] = {}
        for d, s in zip(di.tolist(), sh.to_pylist()):
            got.setdefault(d, []).append(s)
        for i, t in enumerate(texts):
            want = T.shingles(t, k) if t is not None else []
            assert got.get(i, []) == want, (k, i)
    # empty batch keeps its types
    di, sh = T.shingle_explode([], 3)
    assert len(di) == 0 and sh.type == pa.string()


def test_canonical_per_component_tiebreaks():
    """Highest score wins; score ties break to MIN id; singleton
    components keep themselves."""
    import ray

    comp = ray.data.from_arrow(pa.table({
        "doc_id": [0, 1, 2, 3, 4, 5],
        "root":   [0, 0, 0, 3, 3, 5],
        "score":  [10, 30, 30, 7, 7, 1],
    }))
    out = (D.canonical_per_component(comp, score_col="score")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # component 0: docs 1 and 2 tie at 30 -> doc 1 kept
    # component 3: docs 3 and 4 tie at 7 -> doc 3 kept
    # singleton 5 keeps itself
    assert out["keep"].tolist() == [0, 1, 0, 1, 0, 1]
    assert set(out.columns) == {"doc_id", "root", "score", "keep"}
    assert str(out["keep"].dtype) == "int64"


def test_components_carry_cols_passthrough():
    import ray

    docs = ray.data.from_arrow(pa.table({
        "doc_id": [0, 1, 2],
        "text": ["one two three four", "one two three four", "unrelated words here now"],
        "n_chars": [18, 18, 24],
    }))
    pairs = ray.data.from_arrow(pa.table({"doc_a": [0], "doc_b": [1]}))
    out = (D.neardup_components(docs, pairs, carry_cols=("n_chars",))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["root"].tolist() == [0, 0, 2]
    assert out["n_chars"].tolist() == [18, 18, 24]


def test_components_distributed_equals_driver(ray_session):
    """Min-label propagation (no driver graph state) produces exactly
    the union-find roots on chains (transitivity), cliques, and
    isolated corpus docs."""
    import pyarrow as pa
    import ray.data

    from hepcrawl_ray.ops import dedup as D

    pairs = pa.table({"doc_a": [1, 2, 3, 4, 10, 10, 11],
                      "doc_b": [2, 3, 4, 5, 11, 12, 12]})
    corpus = pa.table({"doc_id": list(range(1, 6)) + [10, 11, 12, 20],
                       "text": ["x"] * 9})
    pds = ray.data.from_arrow([pairs.slice(i, 2) for i in range(0, 7, 2)])
    cds = ray.data.from_arrow([corpus.slice(i, 3) for i in range(0, 9, 3)])
    out = (D.neardup_components_distributed(cds, pds).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    ref = (D.neardup_components(cds, pds).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out[["doc_id", "root"]].equals(ref[["doc_id", "root"]])
    assert dict(zip(out["doc_id"], out["root"]))[5] == 1  # chain end
    assert dict(zip(out["doc_id"], out["root"]))[20] == 20  # isolated
