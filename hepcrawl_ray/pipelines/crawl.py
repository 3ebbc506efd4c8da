"""The crawl pipeline: seeds -> frontier actors -> fetch -> parse -> write.

Ray-Data restructuring of the reference's spider lifecycle (traced in
SURVEY.md §3): the driver builds seed rows, a stateless
``canonicalize_batch`` stage computes crawl identity, a router stage
pushes rows to host-partitioned frontier actors (worker -> actor data
flow; the driver only orchestrates), the actors seal + drain the full
admission schedule in parallel virtual time, and ONE streaming Dataset
pipeline fetches bytes and parses captions over the admissions.

Scale notes (design for 256 nodes / 100 TB, tested single-node):

- Only the fetch/parse Dataset ever carries image bytes; frontier
  traffic is bytes-free URL metadata.
- The corpus index is broadcast once with ``ray.put`` and read in each
  fetch actor's ``__init__`` — never per batch.
- Admissions are returned as per-partition Arrow refs and assembled
  with ``from_arrow_refs`` — no driver-side row loop anywhere.
- Output is written as partitioned Parquet under ``output_dir`` so a
  rerun can skip finished partitions; frontier state checkpoints under
  ``checkpoint_dir`` (exact resume, see tests/test_frontier.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hepcrawl_ray import urlkit
from hepcrawl_ray.frontier import FrontierPartition, canonicalize_batch
from hepcrawl_ray.stages import FetchStage, ParseStage


def _make_router(actors, num_partitions):
    """Stateless map_batches body: split a canonical-offer batch by host
    partition and push each slice to its frontier actor."""
    import ray

    def route(batch: pa.Table) -> pa.Table:
        hosts = batch.column("host").to_pylist()
        parts = np.array([urlkit.partition_of_host(h, num_partitions)
                          for h in hosts])
        pending = []
        for p in np.unique(parts):
            sub = batch.filter(pa.array(parts == p))
            pending.append(actors[int(p)].offer.remote(sub))
        ray.get(pending)  # backpressure: batch is delivered before task ends
        return pa.table({"offered": [batch.num_rows]})

    return route


def start_frontier(politeness_rows, num_partitions=4, salted_hosts=None,
                   capacity_per_partition=1 << 17, tick_ms=100,
                   num_cpus_per_actor=0.5):
    """Create the frontier actor pool."""
    import ray

    actor_cls = ray.remote(num_cpus=num_cpus_per_actor)(FrontierPartition)
    return [
        actor_cls.remote(i, num_partitions, politeness_rows,
                         capacity=capacity_per_partition, tick_ms=tick_ms,
                         salted_hosts=salted_hosts)
        for i in range(num_partitions)
    ]


def restore_frontier(checkpoint_dir, num_partitions, num_cpus_per_actor=0.5):
    """Re-create the actor pool from a checkpoint (exact resume)."""
    import ray

    actor_cls = ray.remote(num_cpus=num_cpus_per_actor)(FrontierPartition)
    actors = [actor_cls.remote(i, num_partitions, [])
              for i in range(num_partitions)]
    ray.get([a.load_checkpoint.remote(checkpoint_dir, i)
             for i, a in enumerate(actors)])
    return actors


def offer_seeds(actors, seeds, num_partitions, offer_batch_size=8192):
    """Canonicalize + route the seed stream into the frontier actors."""
    import ray

    ds = (ray.data.from_arrow(seeds) if isinstance(seeds, pa.Table)
          else ray.data.read_parquet(seeds))
    routed = (
        ds.map_batches(canonicalize_batch, batch_format="pyarrow",
                       batch_size=offer_batch_size)
        .map_batches(_make_router(actors, num_partitions),
                     batch_format="pyarrow", batch_size=offer_batch_size)
    )
    total = sum(row["offered"] for row in routed.take_all())
    ray.get([a.seal.remote() for a in actors])
    return total


def drain_admissions(actors, max_rounds=None):
    """Drain all partitions in parallel; returns a Dataset of admissions
    in explicit (round, host, pop_idx) order columns."""
    import ray

    refs = [a.drain.remote(max_rounds) for a in actors]
    return ray.data.from_arrow_refs(refs)


def fetch_and_parse(admissions_ds, images, *, fetch_concurrency=4,
                    parse_concurrency=4, batch_size=1024,
                    verify_pixels=True):
    """The streaming fetch -> parse pipeline over admission rows."""
    import ray

    images_ref = ray.put(images)
    return (
        admissions_ds
        .map_batches(FetchStage, fn_constructor_args=(images_ref,),
                     batch_format="pyarrow", batch_size=batch_size,
                     concurrency=(1, fetch_concurrency), num_cpus=0.5)
        .map_batches(ParseStage, fn_constructor_args=(verify_pixels,),
                     batch_format="pyarrow", batch_size=batch_size,
                     concurrency=(1, parse_concurrency), num_cpus=0.5)
    )


def run_crawl(images, seeds, politeness, *, num_partitions=4,
              salted_hosts=None, output_dir=None, checkpoint_dir=None,
              fetch_concurrency=4, parse_concurrency=4,
              batch_size=1024, verify_pixels=True):
    """Full crawl.  Returns dict with the records Dataset and metrics."""
    import ray

    pol_rows = politeness.to_pylist() if isinstance(politeness, pa.Table) \
        else list(politeness)
    actors = start_frontier(pol_rows, num_partitions, salted_hosts)
    offered = offer_seeds(actors, seeds, num_partitions)
    if checkpoint_dir:
        ray.get([a.checkpoint.remote(checkpoint_dir) for a in actors])
    admissions = drain_admissions(actors)
    records = fetch_and_parse(
        admissions, images, fetch_concurrency=fetch_concurrency,
        parse_concurrency=parse_concurrency, batch_size=batch_size,
        verify_pixels=verify_pixels)
    if output_dir:
        records.write_parquet(output_dir)
        records = ray.data.read_parquet(output_dir)
    metrics = ray.get([a.get_metrics.remote() for a in actors])
    for a in actors:
        ray.kill(a)
    return {"records": records, "metrics": metrics, "offered": offered}
