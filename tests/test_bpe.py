"""BPE merge learning: the vectorized distributed path must equal an
independent textbook implementation (ops/bpe.py reference_bpe)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from hepcrawl_ray.ops import bpe


def _learn_from_texts(texts, n):
    """Drive learn_merges through the same word-count semantics the
    distributed path uses, without Ray."""
    from collections import Counter

    wc = Counter()
    for s in texts:
        if s:
            wc.update(bpe._WORD_RE.findall(s))
    words = sorted(wc)
    counts = np.array([wc[w] for w in words], dtype=np.int64)
    return bpe.learn_merges(words, counts, n_merges=n)


def test_simple_corpus_matches_reference():
    texts = ["low lower lowest", "low low slow", "newer newest new"]
    assert _learn_from_texts(texts, 10) == bpe.reference_bpe(texts, 10)


def test_overlapping_pairs_aaaa():
    # 'aaaa' stresses leftmost non-overlapping replacement
    texts = ["aaaa aaaa baaa", "aa aaa"]
    assert _learn_from_texts(texts, 6) == bpe.reference_bpe(texts, 6)


def test_tie_break_is_lexicographic():
    # 'ab' and 'cd' both occur twice; (a,b) < (c,d) must win round 1
    texts = ["ab ab cd cd"]
    got = _learn_from_texts(texts, 1)
    assert got == [("a", "b", 2)]
    assert got == bpe.reference_bpe(texts, 1)


def test_stops_when_no_pair_repeats():
    texts = ["xy"]  # every pair count is 1
    assert _learn_from_texts(texts, 5) == []
    assert bpe.reference_bpe(texts, 5) == []


def test_empty_corpus():
    assert bpe.learn_merges([], np.array([], dtype=np.int64)) == []
    assert bpe.reference_bpe([], 5) == []


def test_random_corpus_matches_reference():
    rng = np.random.RandomState(11)
    alpha = list("abcdef")
    texts = [" ".join("".join(rng.choice(alpha,
                                          size=rng.randint(1, 8)))
                      for _ in range(rng.randint(1, 20)))
             for _ in range(60)]
    assert _learn_from_texts(texts, 30) == bpe.reference_bpe(texts, 30)


def _naive_encode(word, merges):
    """Independent encode: apply each merge in rank order to the whole
    word before moving to the next (equivalent to lowest-rank-first)."""
    symbols = list(word)
    for left, right, _ in merges:
        out, i = [], 0
        while i < len(symbols):
            if (i + 1 < len(symbols) and symbols[i] == left
                    and symbols[i + 1] == right):
                out.append(left + right)
                i += 2
            else:
                out.append(symbols[i])
                i += 1
        symbols = out
    return tuple(symbols)


def test_encode_word_matches_naive():
    texts = ["low lower lowest newer new", "aaaa baaa low low"]
    merges = bpe.reference_bpe(texts, 12)
    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}
    for w in ("low", "lower", "lowest", "aaaa", "baaa", "zzz", "l",
              "newer"):
        assert bpe.encode_word(w, ranks) == _naive_encode(w, merges), w


def test_encode_word_rank_order_beats_position():
    # merges: rank0=(b,c), rank1=(a,b); in 'abc' the lowest-RANK pair
    # (b,c) must merge first even though (a,b) is leftmost
    ranks = {("b", "c"): 0, ("a", "b"): 1}
    assert bpe.encode_word("abc", ranks) == ("a", "bc")


@pytest.mark.usefixtures("ray_session")
def test_encode_token_counts_sf0001():
    import pyarrow.parquet as pq

    import ray

    tbl = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                        columns=["doc_id", "text"])
    ds = ray.data.from_arrow([tbl.slice(0, 30), tbl.slice(30, 30)])
    merges_df = bpe.train_bpe(ds.select_columns(["text"]), n_merges=20)
    got = bpe.encode_token_counts(ds, merges_df).to_pandas() \
        .set_index("doc_id")["n_bpe_tokens"]
    merges = list(zip(merges_df["left"], merges_df["right"],
                      merges_df["pair_count"]))
    for did, text in zip(tbl.column("doc_id").to_pylist()[:20],
                         tbl.column("text").to_pylist()[:20]):
        want = sum(len(_naive_encode(w, merges))
                   for w in bpe._WORD_RE.findall(text or ""))
        assert got[did] == want


@pytest.mark.usefixtures("ray_session")
def test_distributed_equals_reference_sf0001():
    import pyarrow.parquet as pq

    import ray

    tbl = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                        columns=["text"])
    # multi-chunk dataset so the bucket shuffle actually distributes
    n = tbl.num_rows
    ds = ray.data.from_arrow([tbl.slice(0, n // 2), tbl.slice(n // 2)])
    got = bpe.train_bpe(ds, n_merges=25)
    want = bpe.reference_bpe(tbl.column("text").to_pylist(), 25)
    assert list(zip(got["left"], got["right"],
                    got["pair_count"])) == want
    assert got["rank"].tolist() == list(range(len(want)))
