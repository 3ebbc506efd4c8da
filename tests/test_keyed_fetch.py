"""KeyedFetchStage: stored-corpus keyed lookup == broadcast FetchStage.

The scale contract (VERDICT r2 item 5): fetch actors must hold
O(manifest + a few row groups), never the corpus.  Pinned here via
``max_resident_rows`` under key-clustered batches, plus exact output
equivalence with the broadcast path (including misses, empty batches,
multi-file corpora) and an e2e crawl driven by a corpus PATH.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hepcrawl_ray import synth
from hepcrawl_ray.stages import FetchStage, KeyedFetchStage

ROW_GROUP = 64


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    images, _ = synth.generate_corpus(500, size_range=(16, 24))
    seeds = synth.generate_seeds(images)
    d = tmp_path_factory.mktemp("keyed_corpus")
    path = str(d / "images.parquet")
    pq.write_table(images, path, row_group_size=ROW_GROUP)
    return images, seeds, path


def _batch(urls):
    return pa.table({"url": pa.array(urls, pa.string()),
                     "seq": pa.array(range(len(urls)), pa.int64())})


class TestKeyedFetchStage:
    def test_clustered_batch_equivalence_and_residency(self, ray_session,
                                                       corpus):
        import ray

        images, seeds, path = corpus
        small = FetchStage(ray.put(images))
        keyed = KeyedFetchStage(path, cache_rowgroups=2)
        urls = seeds.column("url").to_pylist()
        # seeds are generated in corpus order -> consecutive slices are
        # key-clustered, the shape admission streams actually have
        for lo in (0, 100, 200):
            b = _batch(urls[lo:lo + 80])
            assert small(b).equals(keyed(b))
        # O(batch): never more than one batch's groups + the LRU cache
        assert keyed.max_resident_rows <= 4 * ROW_GROUP
        assert keyed.max_resident_rows < images.num_rows

    def test_misses_and_empty(self, ray_session, corpus):
        import ray

        images, _, path = corpus
        small = FetchStage(ray.put(images))
        keyed = KeyedFetchStage(path)
        miss = _batch(["http://h/x/zz_absent_1", "http://h/x/zz_absent_2"])
        assert small(miss).equals(keyed(miss))
        empty = _batch([])
        assert small(empty).equals(keyed(empty))

    def test_mixed_hit_miss_scattered(self, ray_session, corpus):
        import ray

        images, seeds, path = corpus
        small = FetchStage(ray.put(images))
        keyed = KeyedFetchStage(path, cache_rowgroups=3)
        urls = seeds.column("url").to_pylist()
        rng = np.random.default_rng(7)
        pick = [urls[i] for i in rng.choice(len(urls), 60, replace=False)]
        pick.insert(5, "http://h/x/zz_absent")
        b = _batch(pick)
        assert small(b).equals(keyed(b))

    def test_multi_file_corpus(self, ray_session, corpus, tmp_path):
        import ray

        images, seeds, _ = corpus
        half = images.num_rows // 2
        d = tmp_path / "multi"
        d.mkdir()
        pq.write_table(images.slice(0, half), str(d / "a.parquet"),
                       row_group_size=ROW_GROUP)
        pq.write_table(images.slice(half), str(d / "b.parquet"),
                       row_group_size=ROW_GROUP)
        small = FetchStage(ray.put(images))
        keyed = KeyedFetchStage(str(d))
        urls = seeds.column("url").to_pylist()
        b = _batch(urls[half - 40:half + 40])  # straddles the file split
        assert small(b).equals(keyed(b))

    def test_missing_stats_rejected(self, tmp_path):
        images, _ = synth.generate_corpus(50, size_range=(16, 20))
        p = str(tmp_path / "nostats.parquet")
        pq.write_table(images, p, write_statistics=False)
        with pytest.raises(ValueError, match="statistics"):
            KeyedFetchStage(p)


class TestCrawlWithStoredCorpus:
    def test_run_crawl_path_equals_table(self, ray_session, corpus):
        from hepcrawl_ray.pipelines import crawl as cp

        images, seeds, path = corpus
        politeness = synth.generate_politeness()

        def run(img):
            out = cp.run_crawl(img, seeds, politeness, num_partitions=3,
                               fetch_concurrency=2, parse_concurrency=2,
                               batch_size=128)
            t = pa.concat_tables(out["records"].iter_batches(
                batch_size=10_000, batch_format="pyarrow"))
            return t.sort_by("seq")

        a = run(images)
        b = run(path)
        assert a.equals(b)
