"""Kill/resume with partitioned output: finished partitions are skipped
untouched, the resumed run completes to a byte-identical result."""

import os

import pyarrow as pa
import pytest

from hepcrawl_ray import synth
from hepcrawl_ray.pipelines import sink


@pytest.fixture(scope="module")
def corpus():
    images, _ = synth.generate_corpus(100)
    seeds = synth.generate_seeds(images)
    politeness = synth.generate_politeness()
    return images, seeds, politeness


def _collect(output_dir):
    ds = sink.read_output(output_dir)
    t = pa.concat_tables(ds.iter_batches(batch_size=100_000,
                                         batch_format="pyarrow"))
    return t.sort_by([("url", "ascending"), ("seq", "ascending"),
                      ("round", "ascending")])


def test_crash_resume_identical_output(ray_session, corpus, tmp_path):
    images, seeds, politeness = corpus
    P = 4

    # clean reference run
    clean_out = str(tmp_path / "clean")
    m = sink.run_resumable_crawl(
        images, seeds, politeness, output_dir=clean_out,
        checkpoint_dir=str(tmp_path / "clean_ckpt"), num_partitions=P,
        fetch_concurrency=2, parse_concurrency=2)
    assert len(m["partitions"]) == P
    clean = _collect(clean_out)

    # crashing run: dies after 2 partitions
    out = str(tmp_path / "crash")
    ckpt = str(tmp_path / "crash_ckpt")
    m1 = sink.run_resumable_crawl(
        images, seeds, politeness, output_dir=out, checkpoint_dir=ckpt,
        num_partitions=P, fetch_concurrency=2, parse_concurrency=2,
        fail_after_partitions=2)
    assert len(m1["partitions"]) == 2

    # record state of finished partition files
    finished = sorted(m1["partitions"])
    mtimes = {}
    for pid in finished:
        d = os.path.join(out, f"part={pid}")
        mtimes[pid] = {f: os.path.getmtime(os.path.join(d, f))
                       for f in os.listdir(d)}

    # resume: must skip finished partitions (files untouched)
    m2 = sink.run_resumable_crawl(
        images, seeds, politeness, output_dir=out, checkpoint_dir=ckpt,
        num_partitions=P, fetch_concurrency=2, parse_concurrency=2)
    assert len(m2["partitions"]) == P
    for pid in finished:
        d = os.path.join(out, f"part={pid}")
        assert {f: os.path.getmtime(os.path.join(d, f))
                for f in os.listdir(d)} == mtimes[pid], \
            f"finished partition {pid} was rewritten on resume"

    resumed = _collect(out)
    assert resumed.num_rows == clean.num_rows
    # full content equality on the stable identifying + parsed columns
    for col in ("url", "seq", "round", "pop_idx", "image_id", "caption",
                "title", "date_published", "document_type", "error",
                "pixels_verified", "phash_decoded"):
        assert resumed.column(col).equals(clean.column(col)), col


def test_orphan_partition_dir_rewritten(ray_session, corpus, tmp_path):
    """A partition directory WITHOUT a manifest entry is crash garbage
    (an in-flight write that missed its manifest record): a run must
    rebuild it rather than trust its contents."""
    images, seeds, politeness = corpus
    out = str(tmp_path / "orphan")
    os.makedirs(os.path.join(out, "part=1"))
    junk = os.path.join(out, "part=1", "stale.parquet")
    with open(junk, "w") as f:
        f.write("not parquet")

    m = sink.run_resumable_crawl(
        images, seeds, politeness, output_dir=out,
        checkpoint_dir=str(tmp_path / "orphan_ckpt"), num_partitions=2,
        fetch_concurrency=2, parse_concurrency=2)
    assert len(m["partitions"]) == 2
    assert not os.path.exists(junk), "stale crash leftover survived"
    t = _collect(out)
    assert t.num_rows > 0


def test_compact_output_preserves_rows(ray_session, corpus, tmp_path):
    images, seeds, politeness = corpus
    out = str(tmp_path / "compact")
    sink.run_resumable_crawl(
        images, seeds, politeness, output_dir=out,
        checkpoint_dir=str(tmp_path / "compact_ckpt"),
        num_partitions=4, fetch_concurrency=2, parse_concurrency=2)
    before = _collect(out)
    n_before = sum(
        len(sink._partition_files(out, pid, meta))
        for pid, meta in sink.read_manifest(out)["partitions"].items())

    # tiny target forces real merging
    stats = sink.compact_output(out, target_bytes=1 << 30)
    assert stats["files_before"] == n_before
    assert stats["files_after"] <= stats["files_before"]
    after = _collect(out)
    assert after.equals(before)          # byte-identical row content

    # manifest now pins explicit compacted file lists
    m = sink.read_manifest(out)
    compacted = [meta for meta in m["partitions"].values()
                 if "files" in meta]
    assert len(compacted) == stats["partitions_compacted"]
    for meta in compacted:
        assert all(f.startswith("_compact/") for f in meta["files"])

    # idempotent: second run compacts nothing, rows unchanged
    stats2 = sink.compact_output(out, target_bytes=1 << 30)
    assert stats2["partitions_compacted"] == 0
    assert stats2["files_before"] == stats2["files_after"] \
        == stats["files_after"]
    assert _collect(out).equals(before)


def test_compact_output_multi_bin(ray_session, corpus, tmp_path):
    """Small-file state with a TINY size target: each partition packs
    into several output bins (exercising the parallel per-bin Ray
    merge tasks, not just the one-file collapse), content is
    byte-identical and every bin respects the greedy target except
    single oversized files."""
    images, seeds, politeness = corpus
    out = str(tmp_path / "multibin")
    sink.run_resumable_crawl(
        images, seeds, politeness, output_dir=out,
        checkpoint_dir=str(tmp_path / "multibin_ckpt"),
        num_partitions=2, fetch_concurrency=2, parse_concurrency=2,
        max_rows_per_file=8)   # many small files per partition
    before = _collect(out)
    m0 = sink.read_manifest(out)
    sizes = {pid: [os.path.getsize(f) for f in
                   sink._partition_files(out, pid, meta)]
             for pid, meta in m0["partitions"].items()}
    target = 3 * max(max(s) for s in sizes.values() if s)
    stats = sink.compact_output(out, target_bytes=target)
    assert stats["partitions_compacted"] >= 1
    assert stats["files_after"] < stats["files_before"]
    # at least one compacted partition holds MULTIPLE bins
    m = sink.read_manifest(out)
    n_bins = [len(meta["files"]) for meta in m["partitions"].values()
              if "files" in meta]
    assert any(n > 1 for n in n_bins), n_bins
    assert _collect(out).equals(before)
    # greedy bound: no bin may exceed the target unless it is a
    # single source file (none is here — sources are 8-row files)
    for pid, meta in m["partitions"].items():
        for f in sink._partition_files(out, pid, meta):
            assert os.path.getsize(f) <= 2 * target


def test_compact_output_crash_orphans_ignored(ray_session, corpus,
                                              tmp_path):
    import os

    images, seeds, politeness = corpus
    out = str(tmp_path / "orphan")
    sink.run_resumable_crawl(
        images, seeds, politeness, output_dir=out,
        checkpoint_dir=str(tmp_path / "orphan_ckpt"),
        num_partitions=2, fetch_concurrency=2, parse_concurrency=2)
    before = _collect(out)

    # simulate a crash BEFORE the manifest commit: half-written
    # compacted files exist but the manifest never switched
    pid = sorted(sink.read_manifest(out)["partitions"])[0]
    comp = os.path.join(out, f"part={pid}", "_compact")
    os.makedirs(comp)
    with open(os.path.join(comp, "c00000.parquet"), "wb") as f:
        f.write(b"garbage half-written parquet")
    assert _collect(out).equals(before)   # readers never see orphans

    # the next compaction sweeps the orphan and completes
    sink.compact_output(out, target_bytes=1 << 30)
    assert _collect(out).equals(before)
