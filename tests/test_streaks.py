"""Unit edge cases for the gaps-and-islands run kernel
(`queries._max_streaks`) — pure numpy, no Ray session needed; the
end-to-end query is pinned by the DuckDB oracle mirror."""

import numpy as np
import pandas as pd

from hepcrawl_ray.pipelines.queries import _max_streaks


def _got(u, d):
    out = _max_streaks(np.asarray(u, np.int64), np.asarray(d, np.int64))
    return dict(zip(out["user_id"], out["max_streak"]))


def test_single_day_is_streak_of_one():
    assert _got([7], [100]) == {7: 1}


def test_gap_breaks_run():
    # days 1,2,3 then 5,6 -> max 3
    assert _got([1] * 5, [1, 2, 3, 5, 6]) == {1: 3}


def test_duplicate_pairs_collapse():
    # same (user, day) seen from multiple batches must not inflate runs
    assert _got([1, 1, 1, 1], [4, 4, 5, 5]) == {1: 2}


def test_runs_do_not_leak_across_users():
    # user 1 ends at day 10, user 2 starts at day 11 - not one run
    assert _got([1, 1, 2, 2], [9, 10, 11, 12]) == {1: 2, 2: 2}


def test_unsorted_input():
    assert _got([3, 3, 3], [20, 18, 19]) == {3: 3}


def test_empty():
    out = _max_streaks(np.array([], np.int64), np.array([], np.int64))
    assert len(out) == 0
    assert list(out.columns) == ["user_id", "max_streak"]


def test_matches_naive_reference():
    rng = np.random.RandomState(7)
    u = rng.randint(0, 12, 400).astype(np.int64)
    d = rng.randint(0, 30, 400).astype(np.int64)
    got = _got(u, d)
    want = {}
    df = pd.DataFrame({"u": u, "d": d}).drop_duplicates()
    for uu, g in df.groupby("u"):
        days = np.sort(g["d"].unique())
        best = run = 1
        for i in range(1, len(days)):
            run = run + 1 if days[i] - days[i - 1] == 1 else 1
            best = max(best, run)
        want[int(uu)] = best
    assert got == want
