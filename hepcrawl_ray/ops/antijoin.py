"""Scale-shaped anti-join: broadcast Bloom prefilter + keyed verify.

The reference's "new work = listing minus already-done" checks
(FTP ``list_missing_files``, DESY processed-bucket skip, Elsevier
package HEAD probe — reference: hepcrawl/utils.py:139-147,
desy_spider.py:139-150, elsevier_spider.py:167-192) are anti-joins of
a candidate stream against a done-set.  At sandbox size the done-set
broadcasts whole; at 10^10 done-keys it cannot — but its BLOOM
FILTER can (~1.2 GB at 1% FPR for 10^9 keys, ``ray.put`` once).

Two-phase shape:

1. Bloom prefilter inside ``map_batches``: a key the bloom does NOT
   contain is DEFINITELY new -> emit immediately, no shuffle.  Only
   bloom HITS (done keys + the ~fpr sliver of false positives) go to
   phase 2.
2. Exact verify of the hits by a keyed bucket gather against the
   done-set dataset (same union + groupby(bucket) + pandas-merge
   pattern as ops.dedup.attach_pair_values) — data moved is
   |done ∩ candidates| + fpr * |candidates|, not |candidates|.

Result == exact NOT IN, always; the bloom only bounds how much
reaches the shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from hepcrawl_ray.state.bloom import BloomFilter


def bloom_anti_join(ds, done_ds, *, key_col: str, done_key_col: str | None = None,
                    capacity: int | None = None, fpr: float = 0.01,
                    num_buckets: int = 64):
    """Rows of ``ds`` whose ``key_col`` is NOT in ``done_ds`` (exact).

    ``done_ds`` is consumed twice: once to build the broadcast bloom
    (streamed, per-batch add), once as the verify side of the keyed
    gather for bloom hits.  Keys must be int64-like."""
    import ray

    done_key_col = done_key_col or key_col

    # phase 0: stream the done-set once to build the bloom (driver
    # holds only the filter bits, never the keys)
    if capacity is None:
        capacity = max(1024, done_ds.count())
    bloom = BloomFilter(capacity=capacity, fpr=fpr)
    for batch in done_ds.select_columns([done_key_col]).iter_batches(
            batch_size=65536, batch_format="pyarrow"):
        bloom.add_many(batch.column(done_key_col).to_numpy(
            zero_copy_only=False).astype(np.int64))
    bloom_ref = ray.put(bloom.to_bytes())

    class Prefilter:
        def __init__(self):
            self.bloom = BloomFilter.from_bytes(ray.get(bloom_ref))

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = t.column(key_col).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            hit = self.bloom.contains_many(keys)
            return t.append_column("_bloom_hit", pa.array(hit))

    marked = ds.map_batches(Prefilter, batch_format="pyarrow",
                            concurrency=(1, 4), num_cpus=0.5)

    definitely_new = marked.map_batches(
        lambda t: t.filter(pa.compute.invert(t.column("_bloom_hit")))
        .drop_columns(["_bloom_hit"]),
        batch_format="pyarrow")

    # phase 2: exact verify of bloom hits via keyed bucket gather
    hits = marked.map_batches(
        lambda t: t.filter(t.column("_bloom_hit"))
        .drop_columns(["_bloom_hit"]),
        batch_format="pyarrow")

    orig_types = dict(zip(ds.schema().names, ds.schema().types))
    cand_cols = list(orig_types)
    int_cols = [c for c in cand_cols if pa.types.is_integer(orig_types[c])]

    def tag_cand(t: pa.Table) -> pa.Table:
        k = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("_side", pa.array(
            np.zeros(len(k), np.int8))).append_column(
            "_bucket", pa.array((k % num_buckets).astype(np.int64)))

    def tag_done(t: pa.Table) -> pa.Table:
        k = t.column(done_key_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cols = {key_col: pa.array(k)}
        for c in cand_cols:
            if c != key_col:
                cols[c] = pa.nulls(len(k), orig_types[c])
        out = pa.table(cols)
        return out.append_column("_side", pa.array(
            np.ones(len(k), np.int8))).append_column(
            "_bucket", pa.array((k % num_buckets).astype(np.int64)))

    unioned = (hits.map_batches(tag_cand, batch_format="pyarrow")
               .union(done_ds.select_columns([done_key_col]).map_batches(
                   tag_done, batch_format="pyarrow")))

    def survivors(g: pd.DataFrame) -> pd.DataFrame:
        done_keys = set(g.loc[g["_side"] == 1, key_col].astype("int64"))
        cand = g[g["_side"] == 0]
        out = cand.loc[~cand[key_col].astype("int64").isin(done_keys),
                       cand_cols].copy()
        # the union's null padding degrades ints to float64 in pandas
        # (CLAUDE.md lesson #13) — restore each column's ORIGINAL dtype
        # (a blanket int64 would diverge from the untouched
        # definitely_new branch for int32/int16 inputs at union time)
        for c in int_cols:
            if not out[c].isna().any():
                out[c] = out[c].astype(orig_types[c].to_pandas_dtype())
        return out

    false_positives = (unioned.groupby("_bucket")
                       .map_groups(survivors, batch_format="pandas"))
    return definitely_new.union(false_positives)
