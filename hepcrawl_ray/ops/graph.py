"""Distributed graph algorithms over edge-list Datasets.

PageRank here is ALL-INTEGER fixed point (1e12 scale, damping as a
85//100 rational), so per-node ranks are exactly order- and
partitioning-independent: integer adds commute, integer floor-division
is deterministic, and the distributed run equals a single-process
reference bit-for-bit (pinned in tests/test_graph.py).  The reference
engine has no graph ops; a crawl-tier engine wants link-structure
ranking next to its frontier (the classic public construction, Page &
Brin 1998).

Scale shape per iteration: ranks are a distributed (node, rank)
Dataset; out-edges pick up their source's rank via ONE keyed bucket
shuffle (contribution = rank // outdeg, outdegree pre-attached to the
edge once), contributions reduce per destination in a second, and the
teleport + dangling terms fold in as two driver scalars — never rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

SCALE = 10**12
DAMP_NUM, DAMP_DEN = 85, 100


def _ranks_to_side(t, n_buckets):
    if isinstance(t, pd.DataFrame):
        t = pa.Table.from_pandas(t, preserve_index=False)
    node = t.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table({
        "node": pa.array(node),
        "dst": pa.nulls(t.num_rows, pa.int64()),
        "outdeg": pa.nulls(t.num_rows, pa.int64()),
        "rank": t.column("rank").cast(pa.int64()),
        "_side": pa.array(np.ones(t.num_rows, np.int8)),
        "_bucket": pa.array((node % n_buckets).astype(np.int64))})


def pagerank(edges_ds, *, iters: int = 5, n_buckets: int = 8,
             src_col: str = "src", dst_col: str = "dst"):
    """Integer-exact PageRank over an edge-list Dataset.

    Returns a Dataset of (node, rank) with rank in 1e12 fixed point;
    every node that appears as a source or destination participates.
    Nodes with no out-edges are dangling: their mass spreads uniformly
    (the standard correction), as a driver scalar.
    """
    import ray
    from ray.data.aggregate import Sum

    def sym(t: pa.Table) -> pa.Table:
        s = t.column(src_col).to_numpy(zero_copy_only=False).astype(np.int64)
        d = t.column(dst_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "node": pa.array(s), "dst": pa.array(d),
            "outdeg": pa.nulls(len(s), pa.int64()),
            "rank": pa.nulls(len(s), pa.int64()),
            "_side": pa.array(np.zeros(len(s), np.int8)),
            "_bucket": pa.array((s % n_buckets).astype(np.int64))})

    raw_edges = edges_ds.map_batches(sym, batch_format="pyarrow")

    # one prep shuffle: attach outdegree to each edge, emit the node
    # universe (sources AND destinations) for rank init
    def prep(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["node", "dst"]].astype({"node": "int64", "dst": "int64"})
        deg = g.groupby("node", as_index=False).size() \
            .rename(columns={"size": "outdeg"})
        m = g.merge(deg, on="node")
        m["outdeg"] = m["outdeg"].astype("int64")
        return m[["node", "dst", "outdeg"]]

    edges = (raw_edges.groupby("_bucket")
             .map_groups(prep, batch_format="pandas")
             .map_batches(lambda t: t.append_column(
                 "rank", pa.nulls(t.num_rows, pa.int64()))
                 .append_column("_side", pa.array(
                     np.zeros(t.num_rows, np.int8)))
                 .append_column("_bucket", pa.array(
                     (t.column("node").to_numpy(zero_copy_only=False)
                      .astype(np.int64) % n_buckets))),
                 batch_format="pyarrow")
             .materialize())
    if edges.num_blocks() > 2 * n_buckets:
        # coalesce DOWN only: a wide upstream read can leave hundreds
        # of tiny blocks and every iteration's shuffle pays per-block
        # fixed cost on them (never split — that adds cost)
        edges = edges.repartition(n_buckets).materialize()

    def universe(t: pa.Table) -> pa.Table:
        nodes = np.unique(np.concatenate([
            t.column("node").to_numpy(zero_copy_only=False).astype(np.int64),
            t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)]))
        return pa.table({"node": pa.array(nodes),
                         "_b": pa.array(nodes % n_buckets)})

    def uniq(g: pd.DataFrame) -> pd.DataFrame:
        nodes = np.sort(pd.unique(g["node"].astype("int64")))
        return pd.DataFrame({"node": nodes,
                             "rank": np.full(len(nodes), SCALE, np.int64)})

    ranks = (edges.map_batches(universe, batch_format="pyarrow")
             .groupby("_b").map_groups(uniq, batch_format="pandas")
             .materialize())
    n_nodes = ranks.count()
    total = n_nodes * SCALE
    teleport = (DAMP_DEN - DAMP_NUM) * (total // n_nodes) // DAMP_DEN

    for _ in range(iters):
        rank_rows = ranks.map_batches(
            lambda t: _ranks_to_side(t, n_buckets), batch_format="pandas")

        def contribs(g: pd.DataFrame) -> pd.DataFrame:
            lab = g[g["_side"] == 1][["node", "rank"]].astype(
                {"node": "int64", "rank": "int64"})
            ed = g[g["_side"] == 0][["node", "dst", "outdeg"]].astype(
                {"node": "int64", "dst": "int64", "outdeg": "int64"})
            m = ed.merge(lab, on="node", how="inner")
            out = pd.DataFrame({
                "node": m["dst"].to_numpy(dtype=np.int64),
                "c": (m["rank"].to_numpy(dtype=np.int64)
                      // m["outdeg"].to_numpy(dtype=np.int64))})
            # sent mass per source (for the dangling residual): what
            # this bucket's sources distributed
            sent = pd.DataFrame({
                "node": np.array([-1], np.int64),
                "c": np.array([int(out["c"].sum())], np.int64)})
            return pd.concat([out, sent], ignore_index=True)

        contrib = (edges.union(rank_rows)
                   .groupby("_bucket")
                   .map_groups(contribs, batch_format="pandas")
                   .materialize())

        def sent_only(t: pa.Table) -> pa.Table:
            node = t.column("node").to_numpy(zero_copy_only=False)
            mask = pa.array(node == -1)
            return pa.table({"c": t.filter(mask).column("c")})

        sent_mass = int(contrib.map_batches(
            sent_only, batch_format="pyarrow").sum("c") or 0)
        dangling_share = (total - sent_mass) // n_nodes

        # every node gets teleport + damped (contrib + dangling share);
        # nodes with no in-edges still need a row -> outer merge with
        # the node universe inside the keyed bucket
        def finish(g: pd.DataFrame) -> pd.DataFrame:
            base = g[g["_side"] == 1][["node"]].astype({"node": "int64"})
            inc = g[g["_side"] == 0][["node", "c"]].astype(
                {"node": "int64", "c": "int64"})
            inc = inc.groupby("node", as_index=False)["c"].sum()
            m = base.merge(inc, on="node", how="left")
            c = m["c"].fillna(0).astype("int64").to_numpy()
            new = teleport + DAMP_NUM * (c + dangling_share) // DAMP_DEN
            return pd.DataFrame({"node": m["node"].astype("int64"),
                                 "rank": new.astype(np.int64)})

        base_rows = ranks.map_batches(
            lambda t: _finish_base(t, n_buckets), batch_format="pandas")
        inc_rows = contrib.map_batches(
            lambda t: _finish_inc(t, n_buckets), batch_format="pyarrow")
        # sort-shuffle output block count tracks INPUT block count, so
        # without a coalesce the rank state doubles its blocks every
        # iteration (16 -> 1008 over 5 iters measured) and per-block
        # fixed cost turns the loop superlinear — bound it each round
        ranks = (base_rows.union(inc_rows)
                 .groupby("_bucket")
                 .map_groups(finish, batch_format="pandas")
                 .repartition(n_buckets)
                 .materialize())
    return ranks


def _finish_base(t, n_buckets):
    if isinstance(t, pd.DataFrame):
        t = pa.Table.from_pandas(t, preserve_index=False)
    node = t.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table({
        "node": pa.array(node),
        "c": pa.nulls(t.num_rows, pa.int64()),
        "_side": pa.array(np.ones(t.num_rows, np.int8)),
        "_bucket": pa.array((node % n_buckets).astype(np.int64))})


def _finish_inc(t: pa.Table, n_buckets: int) -> pa.Table:
    node = t.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
    t = t.filter(pa.array(node >= 0))           # drop sent-mass sentinels
    node = node[node >= 0]
    return pa.table({
        "node": pa.array(node),
        "c": t.column("c").cast(pa.int64()),
        "_side": pa.array(np.zeros(len(node), np.int8)),
        "_bucket": pa.array((node % n_buckets).astype(np.int64))})


def pagerank_reference(src: np.ndarray, dst: np.ndarray,
                       iters: int = 5) -> dict[int, int]:
    """Single-process integer-exact reference (same arithmetic, same
    rounding) for the distributed==reference test."""
    nodes = np.unique(np.concatenate([src, dst]))
    idx = {int(n): i for i, n in enumerate(nodes)}
    n = len(nodes)
    s = np.array([idx[int(x)] for x in src], dtype=np.int64)
    d = np.array([idx[int(x)] for x in dst], dtype=np.int64)
    outdeg = np.bincount(s, minlength=n).astype(np.int64)
    rank = np.full(n, SCALE, dtype=np.int64)
    total = n * SCALE
    teleport = (DAMP_DEN - DAMP_NUM) * (total // n) // DAMP_DEN
    for _ in range(iters):
        contrib = rank[s] // outdeg[s]
        inc = np.zeros(n, dtype=np.int64)
        np.add.at(inc, d, contrib)              # int64-exact, unlike
        sent = int(contrib.sum())               # bincount's float path
        dangling_share = (total - sent) // n
        rank = (teleport
                + DAMP_NUM * (inc + dangling_share) // DAMP_DEN)
    return {int(nodes[i]): int(rank[i]) for i in range(n)}


def _canon_edges(t: pa.Table, src_col: str, dst_col: str,
                 n_buckets: int) -> pa.Table:
    """(lo, hi) canonical undirected edges, self-loops dropped,
    per-batch distinct, bucketed by lo (an edge's bucket is stable, so
    per-bucket dedup is global dedup)."""
    s = t.column(src_col).to_numpy(zero_copy_only=False).astype(np.int64)
    d = t.column(dst_col).to_numpy(zero_copy_only=False).astype(np.int64)
    m = s != d
    lo = np.minimum(s[m], d[m])
    hi = np.maximum(s[m], d[m])
    g = (pa.table({"lo": pa.array(lo), "hi": pa.array(hi)})
         .group_by(["lo", "hi"]).aggregate([]))
    lo2 = g.column("lo").to_numpy(zero_copy_only=False)
    return g.append_column(
        "_b", pa.array((lo2 % n_buckets).astype(np.int64)))


def degree_histogram(edges_ds, *, src_col="src", dst_col="dst",
                     n_buckets: int = 64):
    """(degree, n_nodes) histogram of the UNDIRECTED deduped graph.

    Three collapses, no row ever returns to the driver until the
    |degrees|-sized histogram: per-batch canonical distinct edges ->
    lo-bucket global dedup -> endpoint (node, partial-degree) rows ->
    node-bucket degree sums -> per-bucket histogram partials.
    """
    import ray

    def canon(t: pa.Table) -> pa.Table:
        return _canon_edges(t, src_col, dst_col, n_buckets)

    def bucket_dedup(g: pd.DataFrame) -> pd.DataFrame:
        e = g[["lo", "hi"]].astype("int64").drop_duplicates()
        node = np.concatenate([e["lo"].to_numpy(),
                               e["hi"].to_numpy()])
        per = pd.DataFrame({"node": node}).groupby(
            "node", as_index=False).size().rename(
            columns={"size": "pdeg"})
        per["_nb"] = per["node"].astype("int64") % n_buckets
        return per

    def bucket_hist(g: pd.DataFrame) -> pd.DataFrame:
        deg = g.groupby("node")["pdeg"].sum()
        out = deg.value_counts().rename_axis("degree") \
            .reset_index(name="n_nodes")
        return out.astype({"degree": "int64", "n_nodes": "int64"})

    return (edges_ds.map_batches(canon, batch_format="pyarrow")
            .groupby("_b").map_groups(bucket_dedup,
                                      batch_format="pandas")
            .groupby("_nb").map_groups(bucket_hist,
                                       batch_format="pandas"))


def kcore(edges_ds, *, k: int = 3, src_col="src", dst_col="dst",
          n_buckets: int = 16, max_rounds: int = 30):
    """Distributed k-core decomposition (iterative peeling): drop
    every node with degree < k, recompute, repeat to fixed point.
    Returns a pandas DataFrame (node, degree) of the surviving core —
    core-sized, never the input graph, on the driver.

    Scale shape per round: degrees reduce through ONE node-keyed
    bucket shuffle; the surviving-node set broadcasts once via
    ``ray.put`` (the standard semi-join broadcast — a bloom filter at
    extreme node counts) and the edge set shrinks monotonically.  The
    edge Dataset re-materializes per round with a fixed
    ``repartition`` (CLAUDE lesson 17: iterated state must not let
    block counts grow with rounds)."""
    import ray

    def canon(t: pa.Table) -> pa.Table:
        return _canon_edges(t, src_col, dst_col, n_buckets)

    def bucket_dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g[["lo", "hi"]].astype("int64").drop_duplicates()

    edges = (edges_ds.map_batches(canon, batch_format="pyarrow")
             .groupby("_b").map_groups(bucket_dedup,
                                       batch_format="pandas")
             .repartition(n_buckets).materialize())

    def degrees(ds):
        def endpoint_rows(t: pa.Table) -> pa.Table:
            lo = t.column("lo").to_numpy(zero_copy_only=False)
            hi = t.column("hi").to_numpy(zero_copy_only=False)
            node = np.concatenate([lo, hi]).astype(np.int64)
            vals, cnt = np.unique(node, return_counts=True)
            return pa.table({
                "node": pa.array(vals),
                "pdeg": pa.array(cnt.astype(np.int64)),
                "_nb": pa.array((vals % n_buckets).astype(np.int64))})

        def bucket_deg(g: pd.DataFrame) -> pd.DataFrame:
            out = g.groupby("node", as_index=False)["pdeg"].sum() \
                .rename(columns={"pdeg": "degree"})
            return out.astype({"node": "int64", "degree": "int64"})

        return (ds.map_batches(endpoint_rows, batch_format="pyarrow")
                .groupby("_nb").map_groups(bucket_deg,
                                           batch_format="pandas"))

    n_prev = -1
    deg = degrees(edges).to_pandas()
    for _ in range(max_rounds):
        if len(deg) == 0 or "degree" not in deg.columns:
            return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                                 "degree": pd.Series([],
                                                     dtype="int64")})
        alive = deg.loc[deg["degree"] >= k, "node"] \
            .astype("int64").to_numpy()
        if len(alive) == n_prev:
            break
        n_prev = len(alive)
        alive_ref = ray.put(pa.array(np.sort(alive), pa.int64()))

        def prune(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            keep = ray.get(alive_ref)
            m = pc.and_(
                pc.is_in(pc.cast(t.column("lo"), pa.int64()),
                         value_set=keep),
                pc.is_in(pc.cast(t.column("hi"), pa.int64()),
                         value_set=keep))
            return t.filter(m)

        edges = (edges.map_batches(prune, batch_format="pyarrow")
                 .repartition(n_buckets).materialize())
        deg = degrees(edges).to_pandas()
    deg = deg[deg["degree"] >= k] if "degree" in deg.columns else deg
    if len(deg) == 0:
        return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                             "degree": pd.Series([], dtype="int64")})
    return (deg.astype({"node": "int64", "degree": "int64"})
            .sort_values("node").reset_index(drop=True))


def kcore_reference(src: np.ndarray, dst: np.ndarray,
                    k: int = 3) -> dict[int, int]:
    """Single-process peeling reference for the distributed==reference
    exactness test."""
    s = np.asarray(src, np.int64)
    d = np.asarray(dst, np.int64)
    m = s != d
    lo, hi = np.minimum(s[m], d[m]), np.maximum(s[m], d[m])
    edges = set(zip(lo.tolist(), hi.tolist()))
    while True:
        deg: dict[int, int] = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        dead = {n for n, c in deg.items() if c < k}
        if not dead:
            return deg
        edges = {(a, b) for a, b in edges
                 if a not in dead and b not in dead}
        if not edges:
            return {}


# ------------------------------------------------------------------ BFS ----

def bfs_hops(edges_ds, *, sources=(0,), max_hops: int = 6,
             n_buckets: int = 8, src_col: str = "src",
             dst_col: str = "dst") -> pd.DataFrame:
    """Multi-source BFS hop distance over the UNDIRECTED graph.

    Returns (node, dist) for every node reachable from ``sources``
    within ``max_hops`` hops (sources themselves at dist 0, whether or
    not they appear in the edge list — the SQL recursive-CTE seed
    rule).  Frontier expansion is level-synchronous: each round is two
    keyed bucket shuffles (frontier x adjacency gather, then
    candidates-minus-settled dedup), the settled state re-coalesces to
    ``n_buckets`` blocks every round (CLAUDE.md lesson #17 — without
    it the union+groupby doubles state blocks per round), and the loop
    stops early the first round that settles nothing.

    Oracle-able: DuckDB's WITH RECURSIVE ... UNION enumerates
    (node, dist<=max_hops) pairs; MIN(dist) per node equals the BFS
    distance, so this iterative algorithm gets a real SQL oracle.
    """
    import ray.data as rd

    def sym(t: pa.Table) -> pa.Table:
        s = t.column(src_col).to_numpy(zero_copy_only=False).astype(np.int64)
        d = t.column(dst_col).to_numpy(zero_copy_only=False).astype(np.int64)
        m = s != d
        s, d = s[m], d[m]
        u = np.concatenate([s, d])
        v = np.concatenate([d, s])
        return pa.table({
            "node": pa.array(u), "nbr": pa.array(v),
            "dist": pa.nulls(len(u), pa.int64()),
            "_side": pa.array(np.zeros(len(u), np.int8)),
            "_bucket": pa.array((u % n_buckets).astype(np.int64))})

    def adj_dedup(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["node", "nbr"]].astype({"node": "int64", "nbr": "int64"}) \
            .drop_duplicates()
        g["dist"] = pd.array([pd.NA] * len(g), dtype="Int64")
        g["_side"] = np.int8(0)
        g["_bucket"] = (g["node"] % n_buckets).astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    adj = (edges_ds.map_batches(sym, batch_format="pyarrow")
           .groupby("_bucket").map_groups(adj_dedup,
                                          batch_format="pandas")
           .repartition(n_buckets).materialize())

    src = np.unique(np.asarray(list(sources), np.int64))
    settled_t = pa.table({
        "node": pa.array(src),
        "nbr": pa.nulls(len(src), pa.int64()),
        "dist": pa.array(np.zeros(len(src), np.int64)),
        "_side": pa.array(np.ones(len(src), np.int8)),
        "_bucket": pa.array((src % n_buckets).astype(np.int64))})
    settled = rd.from_arrow(settled_t).materialize()
    n_settled = settled.count()

    for r in range(max_hops):
        def frontier_only(t: pa.Table, _r=r) -> pa.Table:
            d = t.column("dist").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(d == _r))

        frontier = settled.map_batches(frontier_only,
                                       batch_format="pyarrow")

        def expand(g: pd.DataFrame, _r=r) -> pd.DataFrame:
            ed = g[g["_side"] == 0][["node", "nbr"]]
            fr = g[g["_side"] == 1][["node"]]
            if ed.empty or fr.empty:
                cand = np.empty(0, np.int64)
            else:
                m = ed.merge(fr.drop_duplicates(), on="node")
                cand = np.unique(m["nbr"].to_numpy(dtype=np.int64))
            return pa.table({
                "node": pa.array(cand),
                "nbr": pa.nulls(len(cand), pa.int64()),
                "dist": pa.array(np.full(len(cand), _r + 1, np.int64)),
                "_side": pa.array(np.zeros(len(cand), np.int8)),
                "_bucket": pa.array((cand % n_buckets).astype(np.int64))})

        cands = (adj.union(frontier)
                 .groupby("_bucket")
                 .map_groups(expand, batch_format="pandas"))

        def settle(g: pd.DataFrame) -> pd.DataFrame:
            old = g[g["_side"] == 1]
            new = g[g["_side"] == 0].drop_duplicates("node")
            new = new[~new["node"].isin(set(old["node"]))]
            out = pd.concat([old, new], ignore_index=True)
            out["_side"] = np.int8(1)
            out["node"] = out["node"].astype("int64")
            out["dist"] = out["dist"].astype("int64")
            out["_bucket"] = out["_bucket"].astype("int64")
            # rebuild as Arrow (unions need uniform block types and
            # nbr arrives as float64 after the null-int round trip)
            return pa.table({
                "node": pa.array(out["node"].to_numpy(np.int64)),
                "nbr": pa.nulls(len(out), pa.int64()),
                "dist": pa.array(out["dist"].to_numpy(np.int64)),
                "_side": pa.array(np.ones(len(out), np.int8)),
                "_bucket": pa.array(out["_bucket"].to_numpy(np.int64))})

        settled = (settled.union(cands)
                   .groupby("_bucket")
                   .map_groups(settle, batch_format="pandas")
                   .repartition(n_buckets).materialize())
        n_now = settled.count()
        if n_now == n_settled:
            break
        n_settled = n_now

    out = settled.to_pandas()
    out = out[["node", "dist"]].astype({"node": "int64",
                                        "dist": "int64"})
    return out.sort_values("node").reset_index(drop=True)


def bfs_reference(src: np.ndarray, dst: np.ndarray, sources=(0,),
                  max_hops: int = 6) -> dict[int, int]:
    """Single-process BFS for the distributed==reference test."""
    from collections import deque

    s = np.asarray(src, np.int64)
    d = np.asarray(dst, np.int64)
    m = s != d
    adj: dict[int, set] = {}
    for a, b in zip(s[m].tolist(), d[m].tolist()):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {int(x): 0 for x in sources}
    q = deque(dist)
    while q:
        n = q.popleft()
        if dist[n] >= max_hops:
            continue
        for v in adj.get(n, ()):
            if v not in dist:
                dist[v] = dist[n] + 1
                q.append(v)
    return dist
