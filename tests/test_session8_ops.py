"""Session-8 ops: exactness twins on seeded RANDOM tables (the oracle
mirror pins fixed generator tables and the adversarial mirror pins
handcrafted edges; this adds randomized-input agreement against
straightforward pandas references) plus pure-kernel PQ properties."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings, strategies as st

from hepcrawl_ray.ops import knn as K

US = 1_000_000
DAY = 86_400_000_000


def _write_events(d, rng, n_users=12, n_events=300):
    uid = rng.integers(1, n_users + 1, n_events)
    ts = (1_700_000_000 * US
          + rng.integers(0, 40, n_events) * DAY
          + rng.integers(0, 5, n_events) * US)  # deliberate ts ties
    et = rng.choice(["click", "view", "purchase"], n_events)
    t = pa.table({
        "event_id": pa.array(np.arange(1, n_events + 1, dtype=np.int64)),
        "ts": pa.array(ts.astype(np.int64), pa.timestamp("us")),
        "user_id": pa.array(uid.astype(np.int64)),
        "event_type": pa.array(et.astype(object), pa.string()),
        "value": pa.array(np.zeros(n_events)),
        "props": pa.array(["{}"] * n_events),
    })
    pq.write_table(t, os.path.join(d, "events.parquet"))
    return t.to_pandas()


@pytest.fixture(scope="module")
def rand_dir(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s8rand"))
    df = _write_events(d, np.random.default_rng(88))
    return d, df


def test_scd2_matches_row_loop_reference(rand_dir):
    from hepcrawl_ray.pipelines.queries import QUERIES

    d, df = rand_dir
    got = (QUERIES["scd2_user_status"](d).to_pandas()
           .sort_values(["user_id", "valid_from_us", "valid_to_us"])
           .reset_index(drop=True))

    # independent reference: plain per-user row loop
    ref_rows = []
    e = df.assign(ts_us=df["ts"].astype("int64")) \
        .sort_values(["user_id", "ts_us", "event_id"])
    for uid, g in e.groupby("user_id"):
        runs = []
        for _, r in g.iterrows():
            if runs and runs[-1][0] == r["event_type"]:
                continue
            runs.append([r["event_type"], int(r["ts_us"])])
        for i, (et, t0) in enumerate(runs):
            t1 = runs[i + 1][1] if i + 1 < len(runs) else -1
            ref_rows.append((int(uid), et, t0, t1))
    ref = (pd.DataFrame(ref_rows, columns=["user_id", "event_type",
                                           "valid_from_us",
                                           "valid_to_us"])
           .sort_values(["user_id", "valid_from_us", "valid_to_us"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)


def test_gap_fill_invariants_and_conservation(rand_dir):
    from hepcrawl_ray.pipelines.queries import QUERIES

    d, df = rand_dir
    got = QUERIES["gap_fill_daily_activity"](d).to_pandas()
    days = df["ts"].astype("int64") // DAY

    assert got["n_events"].sum() == len(df)          # conservation
    obs = pd.DataFrame({"user_id": df["user_id"], "day": days}) \
        .value_counts().rename("n").reset_index()
    m = got.merge(obs, on=["user_id", "day"], how="left")
    m["n"] = m["n"].fillna(0).astype("int64")
    assert (m["n_events"] == m["n"]).all()           # observed exact
    for uid, g in got.groupby("user_id"):            # contiguous span
        dd = np.sort(g["day"].to_numpy())
        assert dd[0] == days[df["user_id"] == uid].min()
        assert dd[-1] == days[df["user_id"] == uid].max()
        assert (np.diff(dd) == 1).all()


def test_upsert_digests_match_reference(ray_session, tmp_path):
    from hepcrawl_ray.pipelines.queries import QUERIES, _cents

    rng = np.random.default_rng(41)
    n = 400
    # keys dense from 1 so the 97/101/103 moduli all fire
    k = np.arange(1, n + 1, dtype=np.int64)
    price = rng.uniform(10, 5000, n).round(2)
    t = pa.table({"o_orderkey": pa.array(k),
                  "o_custkey": pa.array(k % 29 + 1),
                  "o_orderstatus": pa.array(["F"] * n),
                  "o_totalprice": pa.array(price),
                  "o_orderdate": pa.array(
                      np.full(n, 880_000_000 * US, np.int64),
                      pa.timestamp("us")),
                  "o_orderpriority": pa.array(["1-URGENT"] * n)})
    pq.write_table(t, os.path.join(str(tmp_path), "orders.parquet"))

    got = (QUERIES["upsert_orders"](str(tmp_path)).to_pandas()
           .sort_values("bucket").reset_index(drop=True))

    cents = _cents(price)
    base = pd.DataFrame({"k": k, "cents": cents})
    live = base[base["k"] % 101 != 0].copy()
    live.loc[live["k"] % 97 == 0, "cents"] += 100
    ins = base[(base["k"] % 103 == 0) & (base["k"] % 101 != 0)].copy()
    ins["k"] += 1_000_000_000
    merged = pd.concat([live, ins])
    ref = (merged.assign(bucket=merged["k"] % 64)
           .groupby("bucket", as_index=False)
           .agg(n_rows=("cents", "count"), sum_cents=("cents", "sum"))
           .astype("int64").sort_values("bucket")
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)
    # row accounting: base - deletes + inserts
    n_del = int((base["k"] % 101 == 0).sum())
    assert got["n_rows"].sum() == n - n_del + len(ins)


class TestPqKernelProperties:
    @given(st.integers(0, 2**32 - 1), st.integers(1, 60))
    @settings(max_examples=25, deadline=None)
    def test_codes_bounded_and_deterministic(self, seed, n):
        rng = np.random.default_rng(seed)
        mat = rng.normal(size=(max(n, 20), 64))
        mat /= np.linalg.norm(mat, axis=1)[:, None]
        books = np.stack([rng.normal(size=(16, 8)) for _ in range(8)])
        c1 = K.pq_encode(mat, books)
        c2 = K.pq_encode(mat, books)
        assert c1.shape == (mat.shape[0], 8) and c1.dtype == np.uint8
        assert c1.max() < 16
        assert np.array_equal(c1, c2)

    @given(st.integers(0, 2**32 - 1))
    @settings(max_examples=15, deadline=None)
    def test_adc_exact_on_codewords(self, seed):
        """A vector equal to a codeword concatenation must encode to
        exactly those codewords (nearest-by-L2 to itself)."""
        rng = np.random.default_rng(seed)
        books = np.stack([rng.normal(size=(16, 8)) for _ in range(8)])
        picks = rng.integers(0, 16, 8)
        vec = np.concatenate([books[m][picks[m]] for m in range(8)])
        codes = K.pq_encode(vec[None, :], books)
        assert np.array_equal(codes[0], picks.astype(np.uint8))
