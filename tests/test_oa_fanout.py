"""Open-access conditional fan-out (sources/expand.py)."""

import pyarrow as pa

from hepcrawl_ray.sources.expand import open_access_fanout


def _batch():
    return pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "journal": pa.array(["oa", "oa", "closed", "oa"]),
        "doi": pa.array(["10.1/a", None, "10.1/c", "10.1/d"]),
    })


def test_gate_requires_doi_and_open_journal():
    out = open_access_fanout(_batch(), journal_col="journal",
                             doi_col="doi",
                             open_journals=frozenset({"oa"}))
    kinds = out.column("kind").to_pylist()
    assert kinds.count("record") == 4
    # doc 1 and 4: doi + open journal; doc 2 no doi; doc 3 closed
    fetch = out.filter(pa.compute.equal(out.column("kind"), "fetch"))
    assert sorted(fetch.column("doc_id").to_pylist()) == [1, 4]
    assert fetch.column("fetch_url").to_pylist() == [
        "http://dx.doi.org/10.1/a", "http://dx.doi.org/10.1/d"]


def test_empty_open_set_emits_records_only():
    out = open_access_fanout(_batch(), journal_col="journal",
                             doi_col="doi", open_journals=frozenset())
    assert out.column("kind").to_pylist() == ["record"] * 4


def test_empty_batch():
    out = open_access_fanout(_batch().slice(0, 0), journal_col="journal",
                             doi_col="doi",
                             open_journals=frozenset({"oa"}))
    assert out.num_rows == 0
    assert "fetch_url" in out.schema.names
