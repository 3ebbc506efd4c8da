"""End-to-end crawl over Ray: seeds -> frontier actors -> fetch -> parse.

The functional-test analog of the reference's docker-compose e2e suite
(reference: tests/functional/arxiv/test_arxiv.py:36-127): run the whole
pipeline on the synthetic corpus and compare against goldens + the
simulator, including the per-row pixel/caption invariant from
BASELINE.json (PSNR >= 40 dB lossy / exact lossless + caption
equality).
"""

import numpy as np
import pyarrow as pa
import pytest

from hepcrawl_ray import codecs, synth
from hepcrawl_ray.pipelines import crawl as cp
from hepcrawl_ray.sim import simulate


@pytest.fixture(scope="module")
def corpus():
    images, golden = synth.generate_corpus(120)
    seeds = synth.generate_seeds(images)
    politeness = synth.generate_politeness()
    return images, golden, seeds, politeness


@pytest.fixture(scope="module")
def crawl_result(ray_session, corpus, tmp_path_factory):
    images, golden, seeds, politeness = corpus
    out = cp.run_crawl(images, seeds, politeness, num_partitions=3,
                       output_dir=str(tmp_path_factory.mktemp("crawl_out")),
                       fetch_concurrency=2, parse_concurrency=2)
    table = pa.concat_tables(
        out["records"].iter_batches(batch_size=10_000, batch_format="pyarrow"))
    return out, table


class TestEndToEnd:
    def test_row_count_matches_sim(self, crawl_result, corpus):
        _, table = crawl_result
        images, _, seeds, politeness = corpus
        ref = simulate(seeds.to_pylist(), politeness.to_pylist())
        assert table.num_rows == len(ref.admissions)

    def test_admission_order_matches_sim(self, crawl_result, corpus):
        _, table = crawl_result
        images, _, seeds, politeness = corpus
        ref = simulate(seeds.to_pylist(), politeness.to_pylist())
        ordered = table.sort_by([("round", "ascending"), ("host", "ascending"),
                                 ("pop_idx", "ascending")])
        got = list(zip(ordered.column("round").to_pylist(),
                       ordered.column("host").to_pylist(),
                       ordered.column("url").to_pylist(),
                       ordered.column("seq").to_pylist()))
        want = [(r, h, u, s) for (r, h, u, s, _p, _m) in ref.admissions]
        assert got == want

    def test_pixel_and_caption_invariant(self, crawl_result, corpus):
        """BASELINE.json per-row invariant: decoded pixels vs the corpus
        (exact for png, PSNR >= 40 dB for lossy) + exact caption."""
        _, table = crawl_result
        images, _, _, _ = corpus
        src = {r["image_id"]: r for r in images.to_pylist()}
        rows = table.to_pylist()
        checked = 0
        for r in rows:
            if r["fetch_error"] is not None:
                continue
            ref_row = src[r["image_id"]]
            assert r["caption"] == ref_row["caption"]
            got_px = codecs.decode(r["bytes"], r["fmt"])
            ref_px = codecs.decode(ref_row["bytes"], ref_row["fmt"])
            if r["fmt"] == "png":
                assert (got_px == ref_px).all()
            else:
                assert codecs.psnr(got_px, ref_px) >= 40.0
            assert r["pixels_verified"]
            checked += 1
        assert checked > 50

    def test_parse_matches_golden(self, crawl_result, corpus):
        _, table = crawl_result
        _, golden, _, _ = corpus
        gold = {r["image_id"]: r for r in golden.to_pylist()}
        fields = ("title", "abstract", "authors", "collaborations", "dois",
                  "date_published", "document_type")
        n_err = 0
        for r in table.to_pylist():
            if r["fetch_error"] is not None:
                continue
            g = gold[r["image_id"]]
            if g["error"] is not None:
                assert r["error"] == g["error"]
                n_err += 1
            else:
                assert r["error"] is None
                for f in fields:
                    assert r[f] == g[f], (f, r["image_id"])
        # malformed captions flowed through as error rows, not exceptions

    def test_metrics_lineage(self, crawl_result, corpus):
        out, table = crawl_result
        images, _, seeds, politeness = corpus
        ref = simulate(seeds.to_pylist(), politeness.to_pylist())
        m = out["metrics"]
        assert sum(x["dropped_robots"] for x in m) == ref.dropped_robots
        assert sum(x["dropped_dup"] for x in m) == ref.dropped_dup
        assert sum(x["drained"] for x in m) == len(ref.admissions)
        assert out["offered"] == seeds.num_rows


class TestResumeThroughRay:
    def test_spill_through_actor_pool_matches_sim(self, ray_session,
                                                  corpus, tmp_path):
        """run_crawl with the cold-tail spill active (tiny cap so the
        hot host spills through the Ray actor path) produces the exact
        simulator admission schedule, and the partitions report spill
        activity in their metrics."""
        images, _, seeds, politeness = corpus
        out = cp.run_crawl(images, seeds, politeness, num_partitions=3,
                           fetch_concurrency=2, parse_concurrency=2,
                           spill_dir=str(tmp_path / "spill"),
                           spill_threshold_rows=32)
        table = pa.concat_tables(out["records"].iter_batches(
            batch_size=10_000, batch_format="pyarrow"))
        ref = simulate(seeds.to_pylist(), politeness.to_pylist())
        ordered = table.sort_by([("round", "ascending"),
                                 ("host", "ascending"),
                                 ("pop_idx", "ascending")])
        got = list(zip(ordered.column("round").to_pylist(),
                       ordered.column("host").to_pylist(),
                       ordered.column("url").to_pylist(),
                       ordered.column("seq").to_pylist()))
        want = [(r, h, u, s) for (r, h, u, s, _p, _m) in ref.admissions]
        assert got == want
        assert sum(m["spilled_rows"] for m in out["metrics"]) > 0

    def test_checkpoint_restore_actor_pool(self, ray_session, corpus, tmp_path):
        import ray

        images, _, seeds, politeness = corpus
        pol_rows = politeness.to_pylist()
        # run 1: offer, seal, drain 2 rounds, checkpoint, kill
        actors = cp.start_frontier(pol_rows, num_partitions=2)
        cp.offer_seeds(actors, seeds, 2)
        ray.get([a.seal.remote() for a in actors])
        part1 = ray.get([a.drain.remote(2) for a in actors])
        ray.get([a.checkpoint.remote(str(tmp_path)) for a in actors])
        for a in actors:
            ray.kill(a)
        # run 2: restore and finish
        actors = cp.restore_frontier(str(tmp_path), 2)
        part2 = ray.get([a.drain.remote(None) for a in actors])
        resumed = pa.concat_tables(part1 + part2)
        for a in actors:
            ray.kill(a)
        # uninterrupted reference run
        actors = cp.start_frontier(pol_rows, num_partitions=2)
        cp.offer_seeds(actors, seeds, 2)
        ray.get([a.seal.remote() for a in actors])
        full = pa.concat_tables(ray.get([a.drain.remote(None) for a in actors]))
        for a in actors:
            ray.kill(a)
        key = [("round", "ascending"), ("host", "ascending"),
               ("pop_idx", "ascending")]
        assert resumed.sort_by(key).equals(full.sort_by(key))
