"""Distributed clustering over an embedding column, and SemDeDup-style
semantic deduplication built on it.

- ``kmeans_fit``: full-corpus spherical Lloyd's iterations.  Each pass
  is ONE streaming ``map_batches`` over the dataset: the (k, d)
  centroid matrix is broadcast via ``ray.put`` (tiny), every batch
  assigns rows with a single matmul and emits per-cluster PARTIAL SUMS
  (count + vector sum packed to binary), and the driver reduces the
  k-row partials — the classic mean-update never shuffles data rows.
  Contrast with ``ops/knn._train_centroids`` which fits on a 2048-row
  sample; this one sees every row, which is what SemDeDup needs.
- ``kmeans_assign``: one more streaming pass attaching the cluster id
  (and the vector packed to binary so it survives a groupby shuffle —
  Arrow exchanges reject list<T> payloads, CLAUDE.md lesson #9).
- ``semdedup``: within each cluster, prune every vector that has a
  ≥``tau``-cosine neighbor closer to the centroid (ties by lower id) —
  the keep-the-farthest-from-centroid rule of SemDeDup (Abbas et al.
  2023, arXiv:2303.09540).  One keyed shuffle on cluster id; the
  pairwise work is numpy inside the group.  Partitioning assumption:
  cluster sizes stay O(n/k) — SemDeDup runs with large k at scale for
  exactly this reason; a degenerate giant cluster makes the group-local
  O(m^2) matmul the bottleneck (cap k accordingly, or re-fit with
  bigger k).

At 100 TB each Lloyd's pass re-reads the source (streaming, no
materialization); with object-store headroom, ``ds.materialize()``
once before the loop trades memory/spill for read amplification.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from hepcrawl_ray.ops.knn import (_normalize, drop_null_vectors,
                                  list_column_to_matrix)

_HASH_MULT = 2654435761  # Knuth multiplicative hash (deterministic init)


def _init_centroids(ds, k, *, id_col, vec_col) -> np.ndarray:
    """Deterministic k-center seeding: a hash-spread candidate pool
    (the 8k corpus vectors with the smallest multiplicative id hash —
    per-batch local top partials, driver combine sees num_batches x 8k
    rows), then greedy farthest-point selection over the pool.  No RNG
    state, reproducible at any partition count, and far more
    split-resistant than raw hash picks."""
    pool_n = max(8 * k, k)

    def local_k(t: pa.Table) -> pa.Table:
        t = drop_null_vectors(t, vec_col)
        if t.num_rows == 0:
            # a batch can be ALL null vectors (adversarial fixture);
            # typed empty keeps the schema (lesson 27)
            return pa.table({"h": pa.array([], pa.int64()),
                             "vec": pa.array([], pa.binary()),
                             "dim": pa.array([], pa.int64())})
        ids = t.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        h = (ids * _HASH_MULT) % (1 << 31)
        take = np.argsort(h, kind="stable")[:pool_n]
        mat = list_column_to_matrix(t.column(vec_col))[take]
        return pa.table({
            "h": pa.array(h[take]),
            "vec": pa.array([m.tobytes() for m in mat], pa.binary()),
            "dim": pa.array([mat.shape[1]] * len(take), pa.int64())})

    rows = (ds.select_columns([id_col, vec_col])
            .map_batches(local_k, batch_format="pyarrow").take_all())
    if not rows:
        raise ValueError("k-means seeding: no non-null vectors in input")
    rows.sort(key=lambda r: int(r["h"]))
    dim = int(rows[0]["dim"])
    pool = _normalize(np.stack(
        [np.frombuffer(r["vec"], dtype=np.float64).reshape(dim)
         for r in rows[:pool_n]]))
    # greedy max-min: start from the min-hash vector, then repeatedly
    # add the pool member least similar to every chosen seed
    chosen = [0]
    best_sim = pool @ pool[0]
    for _ in range(1, min(k, len(pool))):
        nxt = int(np.argmin(best_sim))
        chosen.append(nxt)
        best_sim = np.maximum(best_sim, pool @ pool[nxt])
    return pool[chosen]


def kmeans_fit(ds, k=10, *, iters=6, id_col="vec_id",
               vec_col="embedding", cache=True):
    """Spherical k-means over the full dataset.  Returns
    (centroids (k, d) unit rows, per-iteration inertia list).

    ``cache=True`` materializes the projected vector column once so
    the ``iters`` passes re-read object-store blocks instead of the
    source parquet (Ray spills if it outgrows memory).  Pass False to
    keep every pass fully streaming from the source."""
    cent = _init_centroids(ds, k, id_col=id_col, vec_col=vec_col)
    vecs = ds.select_columns([vec_col])
    if cache:
        vecs = vecs.materialize()
    inertia_log = []
    for _ in range(iters):
        # centroids ride the TASK closure: k x d floats is small enough
        # to serialize per task, and stateless tasks skip the per-pass
        # actor-pool spin-up that dominated an actor version (measured
        # ~4 s/pass overhead at trivial data sizes).  For k*d beyond
        # ~1e6 switch to ray.put + lookup inside the fn.
        cur = cent

        def partial_sums(t: pa.Table, cent=cur) -> pa.Table:
            kk, d = cent.shape
            t = drop_null_vectors(t, vec_col)
            if t.num_rows == 0:
                return pa.table({"cluster": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64()),
                                 "sums": pa.array([], pa.binary()),
                                 "loss": pa.array([], pa.float64())})
            mat = _normalize(list_column_to_matrix(t.column(vec_col)))
            sims = mat @ cent.T
            assign = np.argmax(sims, axis=1)
            best = sims[np.arange(len(mat)), assign]
            sums = np.zeros((kk, d), dtype=np.float64)
            np.add.at(sums, assign, mat)
            counts = np.bincount(assign, minlength=kk)
            loss = np.bincount(assign, weights=1.0 - best,
                               minlength=kk)
            present = np.nonzero(counts)[0]
            return pa.table({
                "cluster": pa.array(present.astype(np.int64)),
                "n": pa.array(counts[present].astype(np.int64)),
                "sums": pa.array([sums[c].tobytes()
                                  for c in present], pa.binary()),
                "loss": pa.array(loss[present])})

        rows = (vecs.map_batches(partial_sums, batch_format="pyarrow")
                .take_all())
        kk, d = cent.shape
        tot = np.zeros((kk, d), dtype=np.float64)
        cnt = np.zeros(kk, dtype=np.int64)
        loss = 0.0
        for r in sorted(rows, key=lambda r: (int(r["cluster"]),
                                             r["sums"])):
            c = int(r["cluster"])
            tot[c] += np.frombuffer(r["sums"], dtype=np.float64)
            cnt[c] += int(r["n"])
            loss += float(r["loss"])
        inertia_log.append(loss)
        new = cent.copy()
        nz = cnt > 0
        new[nz] = _normalize(tot[nz])
        cent = new
    return cent, inertia_log


def kmeans_assign(ds, centroids: np.ndarray, *, id_col="vec_id",
                  vec_col="embedding", pack_vec=True):
    """Attach ``cluster`` (argmax cosine) and ``centroid_sim``; with
    ``pack_vec`` also carry the normalized vector as binary so it can
    ride a cluster-keyed shuffle.  Stateless task stage (centroids in
    the closure — see kmeans_fit note)."""
    cent = centroids

    def assign_fn(t: pa.Table) -> pa.Table:
        t = drop_null_vectors(t, vec_col)
        if t.num_rows == 0:
            cols = {id_col: pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int64()),
                    "centroid_sim": pa.array([], pa.float64())}
            if pack_vec:
                cols["vec"] = pa.array([], pa.binary())
            return pa.table(cols)
        mat = _normalize(list_column_to_matrix(t.column(vec_col)))
        sims = mat @ cent.T
        assign = np.argmax(sims, axis=1)
        best = sims[np.arange(len(mat)), assign]
        cols = {id_col: t.column(id_col),
                "cluster": pa.array(assign.astype(np.int64)),
                "centroid_sim": pa.array(best)}
        if pack_vec:
            cols["vec"] = pa.array([m.tobytes() for m in mat],
                                   pa.binary())
        return pa.table(cols)

    return (ds.select_columns([id_col, vec_col])
            .map_batches(assign_fn, batch_format="pyarrow"))


def semdedup(ds, centroids: np.ndarray, *, tau=0.9, id_col="vec_id",
             vec_col="embedding"):
    """SemDeDup pruning: within each cluster, drop every vector that
    has a cosine >= tau neighbor sitting FARTHER from the centroid
    (ties by lower id), so each duplicate chain's survivor is the
    member with the LOWEST centroid similarity — the paper's
    keep-farthest-from-centroid rule.  Returns (vec_id, cluster, keep)
    for every input row."""
    assigned = kmeans_assign(ds, centroids, id_col=id_col,
                             vec_col=vec_col, pack_vec=True)

    def prune(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy().astype(np.int64)
        cs = g["centroid_sim"].to_numpy()
        mat = np.stack([np.frombuffer(b, dtype=np.float64)
                        for b in g["vec"]])
        s = mat @ mat.T
        np.fill_diagonal(s, -2.0)
        better = (cs[None, :] < cs[:, None]) | \
                 ((cs[None, :] == cs[:, None]) &
                  (ids[None, :] < ids[:, None]))
        pruned = ((s >= tau) & better).any(axis=1)
        return pd.DataFrame({
            id_col: ids,
            "cluster": g["cluster"].to_numpy().astype(np.int64),
            "keep": (~pruned).astype(np.int64)})

    return assigned.groupby("cluster").map_groups(
        prune, batch_format="pandas")


def mean_vector(ds, *, vec_col="embedding") -> tuple[np.ndarray, int]:
    """One streaming pass: global mean vector + row count via
    per-batch (sum, n) partials (binary-packed, driver-reduced in a
    deterministic order)."""
    def partial(t: pa.Table) -> pa.Table:
        t = drop_null_vectors(t, vec_col)
        if t.num_rows == 0:
            return pa.table({"s": pa.array([], pa.binary()),
                             "n": pa.array([], pa.int64())})
        mat = list_column_to_matrix(t.column(vec_col))
        return pa.table({"s": pa.array([mat.sum(axis=0).tobytes()],
                                       pa.binary()),
                         "n": pa.array([len(mat)], pa.int64())})

    rows = (ds.select_columns([vec_col])
            .map_batches(partial, batch_format="pyarrow").take_all())
    rows.sort(key=lambda r: r["s"])
    tot = None
    n = 0
    for r in rows:
        v = np.frombuffer(r["s"], dtype=np.float64)
        tot = v.copy() if tot is None else tot + v
        n += int(r["n"])
    return tot / max(n, 1), n


def power_iteration_top_pc(ds, *, iters=12, vec_col="embedding",
                           seed=29):
    """Top principal component of the (mean-centered) embedding
    covariance by distributed power iteration.

    Each pass is one streaming ``map_batches``: a batch contributes
    the d-vector partial ``M^T (M v)`` (two matmuls), and the driver
    applies the centering correction ``- n * mean (mean . v)``
    closed-form — the covariance matrix is never formed and no pass
    shuffles rows.  Deterministic start vector (seeded RNG on the
    driver).  Returns (unit component (d,), explained variance)."""
    mean, n = mean_vector(ds, vec_col=vec_col)
    d = mean.shape[0]
    rng = np.random.default_rng(seed)
    v = rng.normal(size=d)
    v /= np.linalg.norm(v)
    lam = 0.0
    for _ in range(iters):
        cur = v

        def partial(t: pa.Table, v=cur) -> pa.Table:
            t = drop_null_vectors(t, vec_col)
            if t.num_rows == 0:
                return pa.table({"s": pa.array([], pa.binary())})
            mat = list_column_to_matrix(t.column(vec_col))
            contrib = mat.T @ (mat @ v)
            return pa.table({"s": pa.array([contrib.tobytes()],
                                           pa.binary())})

        rows = (ds.select_columns([vec_col])
                .map_batches(partial, batch_format="pyarrow")
                .take_all())
        rows.sort(key=lambda r: r["s"])
        acc = np.zeros(d, dtype=np.float64)
        for r in rows:
            acc += np.frombuffer(r["s"], dtype=np.float64)
        # Cv = (1/n) sum x (x.v) - mean (mean.v)
        cv = acc / max(n, 1) - mean * float(mean @ v)
        lam = float(np.linalg.norm(cv))
        if lam == 0.0:
            break
        v = cv / lam
    # sign convention: first nonzero coordinate positive
    nz = np.nonzero(np.abs(v) > 1e-12)[0]
    if len(nz) and v[nz[0]] < 0:
        v = -v
    return v, lam
