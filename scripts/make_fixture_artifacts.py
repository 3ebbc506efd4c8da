"""Materialize the FIXTURES.md §5 oracle artifacts from the simulator.

Writes (deterministic, seed=42):
  <out>/expected_order.parquet  (round, host, url_canonical, seq)
  <out>/expected_seen.parquet   (url_hash)
  <out>/politeness.parquet, seeds.parquet, images.parquet, golden.parquet

Usage: python scripts/make_fixture_artifacts.py [out_dir]
(The test suite checks engine == simulator directly; these files exist
so the oracle is inspectable outside pytest.)
"""

import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, ".")

from hepcrawl_ray import synth, urlkit          # noqa: E402
from hepcrawl_ray.sim import simulate           # noqa: E402


def main(out_dir: str = "/tmp/fixture_artifacts", n: int = 150) -> None:
    import os

    os.makedirs(out_dir, exist_ok=True)
    images, golden = synth.generate_corpus(n)
    seeds = synth.generate_seeds(images)
    politeness = synth.generate_politeness()
    ref = simulate(seeds.to_pylist(), politeness.to_pylist())

    order = pa.table({
        "round": pa.array([r for r, *_ in ref.admissions], pa.int32()),
        "host": [h for _, h, *_ in ref.admissions],
        "url_canonical": [u for _, _, u, *_ in ref.admissions],
        "seq": pa.array([s for _, _, _, s, *_ in ref.admissions], pa.int64()),
    })
    seen = pa.table({"url_hash": pa.array(sorted(ref.seen_hashes), pa.int64())})

    pq.write_table(order, f"{out_dir}/expected_order.parquet")
    pq.write_table(seen, f"{out_dir}/expected_seen.parquet")
    pq.write_table(images, f"{out_dir}/images.parquet")
    pq.write_table(golden, f"{out_dir}/golden.parquet")
    pq.write_table(seeds, f"{out_dir}/seeds.parquet")
    pq.write_table(politeness, f"{out_dir}/politeness.parquet")
    print(f"wrote {out_dir}: {order.num_rows} admissions, "
          f"{seen.num_rows} seen hashes, {n} images "
          f"(dropped: robots={ref.dropped_robots} dup={ref.dropped_dup})")


if __name__ == "__main__":
    main(*(sys.argv[1:2] or ["/tmp/fixture_artifacts"]))
