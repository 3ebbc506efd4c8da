"""Paged-source semantics: Link rel=next following, per-record
fallback, and the harvest predicate."""

import numpy as np
import pyarrow as pa

from hepcrawl_ray.sources.paged import (
    fetch_with_fallback,
    follow_linked_pages,
    should_harvest,
)


def test_follow_linked_pages_chain_and_cycle_guard():
    pages = {"a": ("A", "b"), "b": ("B", "c"), "c": ("C", None)}
    got = follow_linked_pages(lambda k: pages[k], "a")
    assert got == ["A", "B", "C"]
    # a page linking back to an already-seen page terminates
    cyc = {"a": ("A", "b"), "b": ("B", "a")}
    assert follow_linked_pages(lambda k: cyc[k], "a") == ["A", "B"]
    assert follow_linked_pages(lambda k: pages[k], None) == []


def test_fetch_with_fallback_rows():
    batch = pa.table({"doi": ["10.1/ok", "10.1/bad"]})

    def primary(doi):
        if doi.endswith("bad"):
            raise RuntimeError("404")
        return {"v": "primary"}

    out = fetch_with_fallback(batch, primary, lambda d: {"v": "fallback"})
    rows = out.to_pylist()
    assert rows[0] == {"doi": "10.1/ok", "v": "primary",
                       "used_fallback": False}
    assert rows[1] == {"doi": "10.1/bad", "v": "fallback",
                       "used_fallback": True}


def test_should_harvest_predicate():
    keep = should_harvest(
        article_type=["full-length article", "full-length article",
                      "editorial", "full-length article",
                      "full-length article"],
        title=["t", "", "t", "t", "t"],
        journal_title=["J"] * 5,
        journal_volume=["1"] * 5,
        artid=["a", "a", "a", "", ""],
        page_start=["", "", "", "7", ""],
    )
    # in-list+complete, missing title, bad doctype, page_start instead
    # of artid, neither artid nor page_start
    assert list(keep) == [True, False, False, True, False]
    assert keep.dtype == np.bool_
