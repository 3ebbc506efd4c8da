"""LastRunStore wired into a source run: run 2 with the same store
enumerates only the new window (reference semantics:
hepcrawl/spiders/common/oaipmh_spider.py:121-151)."""

import pyarrow as pa

import pytest

from hepcrawl_ray.sources.incremental import (
    harvest_window,
    require_sets,
    run_incremental_harvest,
)
from hepcrawl_ray.state.lastrun import LastRunStore


def _seed_ds():
    import ray

    days = [f"2024-01-{d:02d}" for d in range(1, 31)]
    return ray.data.from_arrow(pa.table({
        "item_id": list(range(30)), "date": days}))


def test_second_run_enumerates_only_new_window(ray_session, tmp_path):
    store = LastRunStore(str(tmp_path), "src")
    ds = _seed_ds()

    def collect(windowed):
        rows = sorted(r["item_id"] for r in windowed.take_all())
        return rows

    got1, (lo1, hi1) = run_incremental_harvest(
        ds, "date", store=store, set_id="setA", until_date="2024-01-10",
        started_at="t0", consume=collect)
    assert (lo1, hi1) == (None, "2024-01-10")
    assert got1 == list(range(10))  # days 1..10

    got2, (lo2, hi2) = run_incremental_harvest(
        ds, "date", store=store, set_id="setA", until_date="2024-01-25",
        started_at="t1", consume=collect)
    assert (lo2, hi2) == ("2024-01-10", "2024-01-25")
    assert got2 == list(range(10, 25))  # ONLY the new window

    # per-set isolation: a different set id starts from scratch
    assert harvest_window(store, "setB") == (None, None)


def test_explicit_from_date_overrides_store(ray_session, tmp_path):
    store = LastRunStore(str(tmp_path), "src")
    store.save("s", from_date=None, until_date="2024-01-05",
               started_at="t", finished_at="t")
    assert harvest_window(store, "s", from_date="2024-01-20",
                          until_date=None) == ("2024-01-20", None)


def test_sets_guard_refuses_harvest_all():
    assert require_sets("a, b ,c") == ["a", "b", "c"]
    assert require_sets(["x"]) == ["x"]
    for bad in (None, "", " , ", []):
        with pytest.raises(ValueError):
            require_sets(bad)


def test_failed_consume_does_not_advance_store(ray_session, tmp_path):
    store = LastRunStore(str(tmp_path), "src")
    ds = _seed_ds()

    def boom(_):
        raise RuntimeError("crash")

    try:
        run_incremental_harvest(ds, "date", store=store, set_id="s",
                                until_date="2024-01-10", consume=boom)
    except RuntimeError:
        pass
    assert store.resume_from("s") is None  # window still unharvested
