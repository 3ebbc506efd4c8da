"""Resumable partitioned output sink.

The output layout is one directory per frontier partition plus a
manifest of completed partitions:

    out/part=3/<ray parquet files>
    out/_MANIFEST.json   {"partitions": {"3": {"rows": N}}, ...}

A killed job resumes by (a) restoring the frontier from its checkpoint
(exact state: seen filters, queues, virtual clock — see
frontier.checkpoint) and (b) skipping partitions already present in
the manifest — the reference achieves the same with its last-run JSON
store + processed-bucket move
(reference: hepcrawl/spiders/common/lastrunstore_spider.py:53-126,
hepcrawl/spiders/desy_spider.py:139-150,233-242).  Manifest updates
are atomic (tmp + rename); a partition directory without a manifest
entry is garbage from a crash and is overwritten on resume.
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa


def _manifest_path(output_dir: str) -> str:
    return os.path.join(output_dir, "_MANIFEST.json")


def read_manifest(output_dir: str) -> dict:
    try:
        with open(_manifest_path(output_dir)) as f:
            return json.load(f)
    except FileNotFoundError:
        return {"partitions": {}}


def _write_manifest(output_dir: str, manifest: dict) -> None:
    tmp = _manifest_path(output_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, _manifest_path(output_dir))


def run_resumable_crawl(images, seeds, politeness, *, output_dir: str,
                        checkpoint_dir: str, num_partitions: int = 4,
                        salted_hosts=None, batch_size: int = 1024,
                        fetch_concurrency: int = 4, parse_concurrency: int = 4,
                        fail_after_partitions: int | None = None):
    """Crawl with per-partition resumable output.

    ``fail_after_partitions`` injects a crash after N partitions are
    written (test hook).  Returns the manifest; call again with the
    same dirs to resume — finished partitions are skipped untouched.
    """
    import ray

    from hepcrawl_ray.pipelines import crawl as cp

    os.makedirs(output_dir, exist_ok=True)
    pol_rows = politeness.to_pylist() if isinstance(politeness, pa.Table) \
        else list(politeness)

    ckpt_marker = os.path.join(checkpoint_dir, "part=0", "state.pkl")
    if os.path.exists(ckpt_marker):
        actors = cp.restore_frontier(checkpoint_dir, num_partitions)
    else:
        actors = cp.start_frontier(pol_rows, num_partitions, salted_hosts)
        cp.offer_seeds(actors, seeds, num_partitions,
                       salted_hosts=salted_hosts)
        ray.get([a.seal.remote() for a in actors])
        ray.get([a.checkpoint.remote(checkpoint_dir) for a in actors])

    manifest = read_manifest(output_dir)
    done = set(manifest["partitions"])
    written = 0
    for pid in range(num_partitions):
        key = str(pid)
        if key in done:
            continue
        admissions = ray.get(actors[pid].drain.remote(None))
        part_dir = os.path.join(output_dir, f"part={pid}")
        if os.path.exists(part_dir):  # crash leftovers without manifest
            shutil.rmtree(part_dir)
        if admissions.num_rows:
            ds = ray.data.from_arrow(admissions)
            records = cp.fetch_and_parse(
                ds, images, fetch_concurrency=fetch_concurrency,
                parse_concurrency=parse_concurrency, batch_size=batch_size)
            records.write_parquet(part_dir)
            n = admissions.num_rows
        else:
            os.makedirs(part_dir, exist_ok=True)
            n = 0
        manifest["partitions"][key] = {"rows": int(n)}
        _write_manifest(output_dir, manifest)
        written += 1
        if fail_after_partitions is not None and written >= fail_after_partitions:
            for a in actors:
                ray.kill(a)
            return manifest  # simulated crash: frontier state is on disk

    for a in actors:
        ray.kill(a)
    return manifest


def read_output(output_dir: str):
    """Dataset over all finished partitions (manifest-listed only)."""
    import ray

    import glob

    manifest = read_manifest(output_dir)
    files = []
    for pid, meta in sorted(manifest["partitions"].items()):
        if meta["rows"] > 0:
            files.extend(sorted(glob.glob(
                os.path.join(output_dir, f"part={pid}", "*.parquet"))))
    return ray.data.read_parquet(files) if files else None
