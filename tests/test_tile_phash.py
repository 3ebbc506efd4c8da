"""Tile-phash (quadrant) image near-dup: the planted quadrant-defaced
probes must pair with their originals on the untouched quadrants, and
the tile hashes must be bit-exact against direct codecs computation."""

import numpy as np
import pandas as pd
import pyarrow as pa

from hepcrawl_ray import codecs as CZ
from hepcrawl_ray.pipelines import queries as Q

SF = "/root/testdata/sf0.001"


def _result() -> pd.DataFrame:
    return Q.q_dedup_phash_tiles(SF).to_pandas()


def test_planted_probes_pair_with_originals(ray_session):
    images, _, _, _ = Q._crawl_tables(SF)
    nums = [int(i[3:]) for i in images.column("image_id").to_pylist()]
    probes = sorted(n for n in nums if n % 25 == 0)
    assert probes, "fixture should contain planted probe sources"
    got = _result()
    pairs = set(zip(got["a"], got["b"]))
    for n in probes:
        # original n pairs with its defaced copy n + offset
        assert (n, n + Q._TILE_PROBE_OFFSET) in pairs, \
            f"probe for image {n} not recovered"
    # probes match on exactly the 3 untouched quadrants (the zeroed
    # top-left quadrant hashes differently from real content)
    probe_rows = got[got["b"] >= Q._TILE_PROBE_OFFSET]
    own = probe_rows[probe_rows["b"] - Q._TILE_PROBE_OFFSET
                     == probe_rows["a"]]
    assert len(own) == len(probes)
    assert (own["n_tiles"] >= 3).all()


def test_tile_hashes_bit_exact_vs_direct(ray_session):
    """The stage fn's (img, tile, tile_ph, full_ph) rows equal a direct
    scalar recompute: decode -> quadrant split -> phash64 per plane."""
    images, _, _, _ = Q._crawl_tables(SF)
    sample = images.select(["image_id", "bytes", "fmt"]).slice(0, 8)
    got = Q._tile_phash_rows(sample).to_pandas()
    for row in sample.to_pylist():
        num = int(row["image_id"][3:])
        gray, _, _ = CZ.decode_luma(row["bytes"], row["fmt"])
        g = gray.astype(np.float32)
        h2, w2 = g.shape[0] // 2, g.shape[1] // 2
        quads = [g[:h2, :w2], g[:h2, w2:], g[h2:, :w2], g[h2:, w2:]]
        expect_t = CZ.phash64_many_from_luma(quads)
        expect_f = CZ.phash64_many_from_luma([g])[0]
        mine = got[got["img"] == num].sort_values("tile")
        assert len(mine) == 4
        assert (mine["tile_ph"].to_numpy() ==
                expect_t.astype(np.int64)).all()
        assert (mine["full_ph"] == int(expect_f)).all()


def test_probe_rows_emitted_for_every_25th(ray_session):
    t = pa.table({"image_id": ["img0000000", "img0000001",
                               "img0000025", "img0000026"],
                  "bytes": [b"", b"", b"", b""], "fmt": ["x"] * 4})
    # undecodable payloads are skipped silently (error rows are the
    # quality gate's job) — zero rows out, typed schema kept
    out = Q._tile_phash_rows(t)
    assert out.num_rows == 0
    assert out.column_names == ["img", "tile", "tile_ph", "full_ph"]


def test_no_pair_exceeds_verify_gate(ray_session):
    got = _result()
    # verify rule: >=2 intact quadrants, or globally similar
    assert ((got["n_tiles"] >= 2) | (got["hamming"] <= 12)).all()
    assert (got["a"] < got["b"]).all()
    assert not got.duplicated(["a", "b"]).any()
