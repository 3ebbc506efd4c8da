"""Exactness twins for the session-5 operators: random seeded inputs,
engine result == independent brute-force reference (numpy/pure-python,
no shared code with the distributed implementation)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hepcrawl_ray.pipelines.queries import (
    q_dedup_containment, q_funnel_conversion, q_peak_concurrent_users)

US = 1_000_000
DAY = 86_400_000_000


def _write_events(d, seed, n_users=25, n_events=400):
    rng = np.random.default_rng(seed)
    uid = rng.integers(1, n_users + 1, n_events).astype(np.int64)
    # cluster timestamps so user-day intervals overlap heavily and
    # exact ties occur (coarse 10-minute grid over ~5 days)
    ts = (1_700_000_000 * US
          + rng.integers(0, 5 * 24 * 6, n_events).astype(np.int64)
          * 600 * US)
    typ = rng.choice(["click", "view", "purchase", "error"], n_events)
    t = pa.table({
        "event_id": pa.array(np.arange(n_events, dtype=np.int64)),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(uid),
        "event_type": pa.array(typ, pa.string()),
        "value": pa.array(np.zeros(n_events)),
        "props": pa.array(["{}"] * n_events, pa.string()),
    })
    pq.write_table(t, os.path.join(d, "events.parquet"))
    return uid, ts, typ


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_peak_concurrency_matches_bruteforce(ray_session, tmp_path, seed):
    d = str(tmp_path)
    uid, ts, _ = _write_events(d, seed)

    # brute force: user-day presence intervals, sweep every distinct
    # delta timestamp in one flat pass
    df = pd.DataFrame({"u": uid, "ts": ts})
    df["day"] = df["ts"] // DAY
    iv = df.groupby(["u", "day"])["ts"].agg(["min", "max"])
    deltas = {}
    for s, e in iv.itertuples(index=False):
        deltas[s] = deltas.get(s, 0) + 1
        deltas[e + 1] = deltas.get(e + 1, 0) - 1
    cur = peak = 0
    first_ts = None
    for t_us in sorted(deltas):
        cur += deltas[t_us]
        if cur > peak:
            peak, first_ts = cur, t_us

    got = q_peak_concurrent_users(d)
    assert int(got["peak"].iloc[0]) == peak
    assert int(got["first_peak_ts_us"].iloc[0]) == first_ts


@pytest.mark.parametrize("seed", [3, 11])
def test_funnel_matches_bruteforce(ray_session, tmp_path, seed):
    d = str(tmp_path)
    uid, ts, typ = _write_events(d, seed)

    df = pd.DataFrame({"u": uid, "ts": ts, "t": typ})
    firsts = (df[df["t"].isin(["click", "view", "purchase"])]
              .groupby(["u", "t"])["ts"].min().unstack()
              .reindex(columns=["click", "view", "purchase"]))
    s1 = firsts["click"].notna()
    s2 = s1 & firsts["view"].notna() & (firsts["view"] > firsts["click"])
    s3 = s2 & firsts["purchase"].notna() & \
        (firsts["purchase"] > firsts["view"])

    got = q_funnel_conversion(d).set_index("stage")["n_users"]
    assert got.loc[1] == int(s1.sum())
    assert got.loc[2] == int(s2.sum())
    assert got.loc[3] == int(s3.sum())


@pytest.mark.parametrize("seed", [5, 19])
def test_containment_pairs_match_bruteforce(ray_session, tmp_path, seed):
    d = str(tmp_path)
    rng = np.random.default_rng(seed)
    vocab = [f"w{k}" for k in range(12)]
    texts = []
    for i in range(40):
        n = int(rng.integers(3, 15))
        texts.append(" ".join(rng.choice(vocab, n)))
    # plant a subset pair: doc 40 is doc 0 plus a long distinct tail
    texts.append(texts[0] + " " + " ".join(f"z{k}" for k in range(30)))
    docs = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["s"] * len(texts), pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(docs, os.path.join(d, "documents.parquet"))

    def sh3(t):
        w = t.split()
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    sets = [sh3(t) for t in texts]
    want = set()
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            inter = len(sets[a] & sets[b])
            mn = min(len(sets[a]), len(sets[b]))
            if mn and (1000 * inter) // mn >= 800:
                want.add((a, b, (1000 * inter) // mn))

    got = q_dedup_containment(d).to_pandas()
    got_set = set(zip(got["doc_a"].astype(int),
                      got["doc_b"].astype(int),
                      got["containment_milli"].astype(int)))
    assert got_set == want
    # the planted subset pair must be present with containment 1.0
    assert (0, 40, 1000) in got_set
