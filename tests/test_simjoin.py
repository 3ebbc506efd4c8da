"""FastSS edit-distance join and 2-D skyline: exactness vs brute force.

The distributed paths (ops/simjoin.py) must produce EXACTLY the pairs /
rows a naive O(n^2) scan finds — FastSS candidate generation is only a
speedup, never a recall trade, and per-block local skylines must be a
lossless projection of the global frontier.
"""

import random

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from hepcrawl_ray.ops import simjoin as SJ


def _brute_pairs(vocab, k):
    out = set()
    for a in vocab:
        for b in vocab:
            if a < b and SJ.levenshtein(a, b) <= k:
                out.add((a, b, SJ.levenshtein(a, b)))
    return out


def test_levenshtein_basics():
    assert SJ.levenshtein("", "") == 0
    assert SJ.levenshtein("abc", "abc") == 0
    assert SJ.levenshtein("abc", "abd") == 1
    assert SJ.levenshtein("abc", "ab") == 1
    assert SJ.levenshtein("abc", "xabc") == 1
    assert SJ.levenshtein("kitten", "sitting") == 3
    assert SJ.levenshtein("", "abc") == 3


def test_deletion_neighborhood_counts():
    nb = SJ._deletion_neighborhood("abcd", 1)
    assert nb == {"abcd", "bcd", "acd", "abd", "abc"}
    nb2 = SJ._deletion_neighborhood("ab", 2)
    assert nb2 == {"ab", "a", "b", ""}


@pytest.mark.parametrize("k", [1, 2])
def test_fastss_matches_bruteforce(ray_session, k):
    import ray.data as rd

    rng = random.Random(42)
    alpha = "abcde"
    vocab = sorted({"".join(rng.choice(alpha)
                            for _ in range(rng.randint(2, 7)))
                    for _ in range(80)})
    # corpus repeats vocab entries (join is over DISTINCT values)
    corpus = [rng.choice(vocab) for _ in range(400)]
    ds = rd.from_pandas(pd.DataFrame({"w": corpus})).repartition(4)
    got = SJ.editdist_selfjoin(ds, col="w", k=k).to_pandas()
    got_set = set(zip(got["name_a"], got["name_b"], got["dist"]))
    assert got_set == _brute_pairs(vocab, k)


def test_fastss_null_and_empty(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"w": pa.array([None, None],
                                               pa.string())}))
    out = SJ.editdist_selfjoin(ds, col="w", k=1).to_pandas()
    assert len(out) == 0


def _brute_sky(df, mn, mx):
    keep = []
    for i, r in df.iterrows():
        dominated = any(
            (o[mn] <= r[mn] and o[mx] >= r[mx]
             and (o[mn] < r[mn] or o[mx] > r[mx]))
            for _, o in df.iterrows())
        if not dominated:
            keep.append(i)
    return df.loc[keep]


def test_local_skyline_bruteforce():
    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "id": np.arange(60, dtype=np.int64),
        "cost": rng.integers(0, 12, 60).astype(np.int64),
        "gain": rng.integers(0, 12, 60).astype(np.int64),
    })
    got = SJ.local_skyline2d(df, "cost", "gain")
    want = _brute_sky(df, "cost", "gain")
    assert sorted(got["id"]) == sorted(want["id"])


def test_local_skyline_ties_survive():
    df = pd.DataFrame({"id": [1, 2, 3], "cost": [5, 5, 5],
                       "gain": [9, 9, 3]})
    got = SJ.local_skyline2d(df, "cost", "gain")
    assert sorted(got["id"]) == [1, 2]


def test_distributed_skyline_matches_local(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "id": np.arange(500, dtype=np.int64),
        "cost": rng.integers(0, 40, 500).astype(np.int64),
        "gain": rng.integers(0, 40, 500).astype(np.int64),
    })
    ds = rd.from_pandas(df).repartition(8)
    got = SJ.skyline2d(ds, "cost", "gain")
    want = SJ.local_skyline2d(df, "cost", "gain")
    assert sorted(got["id"]) == sorted(want["id"])


def test_hamming_knn_matches_bruteforce(ray_session):
    import ray.data as rd

    from hepcrawl_ray.ops import knn as K

    rng = np.random.default_rng(9)
    dim, n = 16, 120
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    vecs[rng.random((n, dim)) < 0.1] = 0.0     # exact zeros (bit = 0)
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()}
            for i in range(n)]
    rows.append({"vec_id": n, "embedding": None})     # unindexed
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(6)
    got = K.hamming_knn(ds, query_ids=(0, 3, n), k=7).to_pandas()
    # null-embedding probe contributes nothing
    assert set(got["probe_id"]) == {0, 3}
    bits = vecs > 0
    for q in (0, 3):
        hd = (bits ^ bits[q]).sum(axis=1)
        order = sorted((int(hd[i]), i) for i in range(n) if i != q)[:7]
        sub = got[got["probe_id"] == q].sort_values(
            ["hamming", "vec_id"])
        assert list(zip(sub["hamming"], sub["vec_id"])) == order


def test_sign_pack_contract():
    from hepcrawl_ray.ops import knn as K

    m = np.array([[1.0, 0.0, -2.0, 3.0]])
    assert K.sign_pack(m)[0] == 0b1001
    assert K.sign_pack(np.zeros((0, 4))).shape == (0,)
    with pytest.raises(ValueError):
        K.sign_pack(np.zeros((1, 65)))


def test_setsim_join_matches_bruteforce(ray_session):
    import itertools

    import ray.data as rd

    from hepcrawl_ray.ops import simjoin as SJ

    rng = np.random.default_rng(21)
    rows = []
    sets = {}
    for oid in range(60):
        items = sorted(rng.choice(30, size=rng.integers(1, 8),
                                  replace=False).tolist())
        sets[oid] = set(items)
        rows.extend({"oid": oid, "item": it} for it in items)
        # duplicates in the exploded input must not change anything
        rows.append({"oid": oid, "item": items[0]})
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(5)
    got = SJ.setsim_join(ds, id_col="oid", item_col="item",
                         t_num=2, t_den=5).to_pandas()
    got_set = {(a, b, c, u) for a, b, c, u in
               zip(got["id_a"], got["id_b"], got["n_common"],
                   got["n_union"])}
    want = set()
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if inter * 5 >= 2 * union:
            want.add((a, b, inter, union))
    assert got_set == want


def test_setsim_join_identical_and_disjoint(ray_session):
    import ray.data as rd

    from hepcrawl_ray.ops import simjoin as SJ

    rows = ([{"oid": 1, "item": i} for i in (5, 6, 7)]
            + [{"oid": 2, "item": i} for i in (5, 6, 7)]
            + [{"oid": 3, "item": i} for i in (20, 21)])
    ds = rd.from_pandas(pd.DataFrame(rows))
    got = SJ.setsim_join(ds, id_col="oid", item_col="item",
                         t_num=1, t_den=2).to_pandas()
    assert [(r.id_a, r.id_b, r.n_common, r.n_union)
            for r in got.itertuples()] == [(1, 2, 3, 3)]
