"""Adaptive keyed dimension attach — the engine's join-strategy pick.

One entry point, two physical plans (both already proven in
pipelines/queries.py; this factors them behind a size-based choice the
way an optimizer would):

- **broadcast** (dim fits comfortably in every worker): the dimension
  is `ray.put` once and each task resolves keys with one vectorized
  ``pyarrow.compute.index_in`` + ``take`` — zero shuffle, the right
  plan for nation/region/config tables.
- **bucket gather** (dim is fact-scale): both sides ride ONE
  key-bucket shuffle null-padded (union) and a per-bucket pandas merge
  attaches the columns — never a driver materialization, never
  ``Dataset.join`` (which crashes on empty LEFT shuffle partitions,
  CLAUDE.md lesson 11).

Inner-join semantics: fact rows whose key misses the dimension are
dropped on both paths.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _as_table(dim) -> pa.Table:
    import ray
    import ray.data

    if isinstance(dim, pa.Table):
        return dim
    if isinstance(dim, ray.data.Dataset):
        batches = list(dim.iter_batches(batch_size=None,
                                        batch_format="pyarrow"))
        if batches:
            return pa.concat_tables(batches)
        # fully-empty dim (e.g. a prune matched nothing): rebuild a
        # TYPED empty table from the dataset schema when Ray still
        # knows it; otherwise a schema-less marker the caller handles
        sch = dim.schema()
        if sch is not None and len(sch.names) > 0:
            return pa.table({n: pa.nulls(0, t)
                             for n, t in zip(sch.names, sch.types)})
        return pa.table({})
    raise TypeError(f"unsupported dimension type {type(dim)!r}")


def attach_dim(fact_ds, dim, fact_key: str, dim_key: str,
               cols: list[str], broadcast_rows: int = 100_000,
               n_buckets: int = 64):
    """Attach ``cols`` from ``dim`` onto ``fact_ds`` rows by key.

    ``dim`` may be a pyarrow Table or a (small-after-pruning) Dataset.
    Strategy: broadcast when the dimension has <= ``broadcast_rows``
    rows, else the bucket-gather shuffle.  Returns (Dataset, strategy)
    so callers/tests can assert the plan choice.
    """
    import ray

    if isinstance(dim, pa.Table) and dim.num_rows <= broadcast_rows:
        small = True
    elif not isinstance(dim, pa.Table):
        # Dataset: count() is metadata-cheap on parquet reads and an
        # O(1)-per-block aggregate otherwise
        small = dim.count() <= broadcast_rows
    else:
        small = False

    if small:
        tbl = _as_table(dim)
        if tbl.num_rows == 0 and dim_key not in tbl.column_names:
            # all-empty AND schema-less (Ray lost the block schema):
            # inner join with an empty dim is empty — emit 0-row fact
            # batches with null-typed attach columns (downstream casts
            # accept the null type)
            def empty_out(batch: pa.Table) -> pa.Table:
                batch = batch.slice(0, 0)
                for c in cols:
                    batch = batch.append_column(
                        c, pa.nulls(0, pa.null()))
                return batch

            return fact_ds.map_batches(empty_out,
                                       batch_format="pyarrow"), \
                "broadcast"
        tbl = tbl.select([dim_key] + cols)
        ref = ray.put(tbl)

        def lookup(batch: pa.Table) -> pa.Table:
            d = ray.get(ref)
            idx = pc.index_in(batch.column(fact_key),
                              value_set=d.column(dim_key))
            hit = pc.is_valid(idx)
            batch = batch.filter(hit)
            idx = pc.filter(idx, hit)
            for c in cols:
                batch = batch.append_column(c, pc.take(d.column(c), idx))
            return batch

        return fact_ds.map_batches(lookup, batch_format="pyarrow"), \
            "broadcast"

    # ---- bucket gather: both sides share one keyed shuffle ----------
    fact_schema = fact_ds.schema()
    fact_names = list(fact_schema.names)
    fact_types = dict(zip(fact_schema.names, fact_schema.types))
    if isinstance(dim, pa.Table):
        dim_types = {c: dim.schema.field(c).type for c in cols}
    else:
        sch = dim.schema()
        dim_types = dict(zip(sch.names, sch.types))
        dim_types = {c: dim_types[c] for c in cols}

    def tag_fact(t: pa.Table) -> pa.Table:
        k = t.column(fact_key).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        out = {n: t.column(n) for n in fact_names}
        for c in cols:
            out[c] = pa.nulls(t.num_rows, dim_types[c])
        out["_side"] = pa.array(np.zeros(t.num_rows, np.int8))
        out["_bucket"] = pa.array((k % n_buckets).astype(np.int64))
        return pa.table(out)

    def tag_dim(t: pa.Table) -> pa.Table:
        k = t.column(dim_key).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        out = {}
        for n in fact_names:
            out[n] = (t.column(dim_key) if n == fact_key
                      else pa.nulls(t.num_rows, fact_types[n]))
        for c in cols:
            out[c] = t.column(c)
        out["_side"] = pa.array(np.ones(t.num_rows, np.int8))
        out["_bucket"] = pa.array((k % n_buckets).astype(np.int64))
        return pa.table(out)

    if isinstance(dim, pa.Table):
        import ray.data
        dim_ds = ray.data.from_arrow(dim.select([dim_key] + cols))
    else:
        dim_ds = dim.select_columns([dim_key] + cols)

    int_facts = [n for n in fact_names
                 if pa.types.is_integer(fact_types[n])]

    def gather(g: pd.DataFrame) -> pd.DataFrame:
        d = g.loc[g["_side"] == 1, [fact_key] + cols].copy()
        f = g.loc[g["_side"] == 0, fact_names].copy()
        for df in (d, f):
            df[fact_key] = df[fact_key].astype("int64")  # lesson 13
        m = f.merge(d, on=fact_key, how="inner")
        for c in int_facts:                               # lesson 13
            if not m[c].isna().any():
                m[c] = m[c].astype(fact_types[c].to_pandas_dtype())
        return m[fact_names + cols]

    unioned = (fact_ds.map_batches(tag_fact, batch_format="pyarrow")
               .union(dim_ds.map_batches(tag_dim,
                                         batch_format="pyarrow")))
    return unioned.groupby("_bucket").map_groups(
        gather, batch_format="pandas"), "gather"
