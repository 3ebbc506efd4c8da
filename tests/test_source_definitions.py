"""Concrete Source definitions (§2.11): WSP / DESY / arXiv end-to-end
through the generic run_source runner — golden record equivalence,
listing-minus-done subtraction, error-row contracts."""

import pyarrow.compute as pc
import pyarrow.parquet as pq

from hepcrawl_ray.sources.definitions import (
    SOURCES,
    WSP_ALLOWED_ARTICLE_TYPES,
    arxiv_source,
    desy_source,
    run_source,
    wsp_source,
)

SF = "/root/testdata/sf0.001"


def _docs():
    t = pq.read_table(SF + "/documents.parquet",
                      columns=["doc_id", "source", "lang"])
    return t.sort_by("doc_id")


def test_wsp_records_match_golden(ray_session):
    docs = _docs()
    df = run_source(wsp_source(), SF).to_pandas()
    # survivors are exactly the allowed-type fixture docs
    want = [d for d in docs.column("doc_id").to_pylist() if d % 5 < 3]
    got = sorted(int(r.rsplit(".", 1)[1]) for r in df["record_id"])
    assert got == sorted(want)
    assert set(df["article_type"]) <= set(WSP_ALLOWED_ARTICLE_TYPES)
    assert (df["title"] == "WSP " + df["record_id"].str.rsplit(
        ".", n=1).str[1]).all()
    assert df["error"].isna().all() if "error" in df else True


def test_wsp_listing_minus_done(ray_session):
    docs = _docs()
    srcs = sorted(set(docs.column("source").to_pylist()))
    done = srcs[:2]
    df = run_source(wsp_source(), SF, done=done).to_pandas()
    assert not set(df["package_id"]) & set(done)
    full = run_source(wsp_source(), SF).to_pandas()
    kept = full[~full["package_id"].isin(done)]
    assert sorted(df["record_id"]) == sorted(kept["record_id"])


def test_desy_error_rows_and_identity(ray_session):
    docs = _docs()
    df = run_source(desy_source(), SF).to_pandas()
    ids = docs.column("doc_id").to_pylist()
    assert len(df) == len(ids)                    # every line -> a row
    bad = df[df["error"].notna()]
    good = df[df["error"].isna()]
    assert sorted(good["doc_id"].astype(int)) == \
        sorted(d for d in ids if d % 7 != 0)
    assert len(bad) == sum(1 for d in ids if d % 7 == 0)
    assert bad["doc_id"].isna().all() and bad["record_id"].isna().all()
    assert (good["record_id"] ==
            "desy:" + good["doc_id"].astype(int).astype(str)).all()
    assert (good["title"] ==
            "DESY " + good["doc_id"].astype(int).astype(str)).all()


def test_arxiv_paged_harvest_golden(ray_session):
    docs = _docs()
    ids = docs.column("doc_id").to_pylist()
    df = run_source(arxiv_source(), SF).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert df["doc_id"].tolist() == sorted(ids)
    # page chain covers all ids in 50-id pages, in order
    assert (df.index // 50 == df["package_id"].str[1:].astype(int)).all()
    # classify surface
    th = df[df["doc_id"] % 10 == 0]
    cf = df[df["doc_id"] % 10 == 5]
    assert (th["document_type"] == "thesis").all()
    assert (th["number_of_pages"] == 120).all()
    assert (cf["document_type"] == "conference paper").all()
    assert cf["number_of_pages"].isna().all()
    assert (df["record_id"] == df["arxiv_eprint"]).all()


def test_sources_registry_and_streaming_shape(ray_session):
    """Every shipped source runs through the ONE generic runner and
    returns a streaming Dataset (no driver materialization)."""
    import ray.data

    for name, mk in SOURCES.items():
        src = mk()
        assert src.name == name
        ds = run_source(src, SF)
        assert isinstance(ds, ray.data.Dataset)
        assert ds.count() > 0
