"""String-similarity self-join (FastSS) and Pareto skyline.

Reference analog: hepcrawl's record-level dedup compares fuzzy keys
(titles/reports) when exact ids are absent (hepcrawl/tohep.py and the
dedupe helpers in hepcrawl/utils.py:220-240); an edit-distance join is
the distributed generalization.  The skyline operator is the standard
"best harvest candidate" shape (cheapest source covering the most
records) — a dominance filter, not a top-k.

Both are built on the repo's one-keyed-shuffle discipline:

* ``editdist_selfjoin`` — exact Levenshtein join over the DISTINCT
  values of a column via FastSS deletion neighborhoods [Bocek et al.,
  "Fast Similarity Search in Large Dictionaries", 2007]: two strings
  with lev(a,b) <= k share at least one member of their <=k-deletion
  neighborhoods, so candidate generation is a single equi-key shuffle
  on the 64-bit variant hash and verification (true DP Levenshtein)
  runs inline on candidate pairs only.  No O(V^2) comparison ever
  happens; the vocabulary is reduced to DISTINCT values first, also
  distributed.
* ``skyline2d`` — 2-D Pareto frontier (minimize one column, maximize
  the other).  Per-batch vectorized local skyline (a local skyline is
  a superset projection of the global one), then the tiny union of
  local skylines is re-filtered once.  Driver holds O(skyline), never
  O(n): the local pass bounds each block's contribution by the number
  of distinct values of the max column in that block.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from hepcrawl_ray.ops.text import content_hash64

_NEG = np.iinfo(np.int64).min


def levenshtein(a: str, b: str) -> int:
    """Plain DP Levenshtein (candidate-verification only — runs on
    FastSS candidate pairs, never across the corpus)."""
    if a == b:
        return 0
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _deletion_neighborhood(s: str, k: int) -> set:
    """All strings reachable from ``s`` by <= k character deletions
    (including ``s`` itself)."""
    seen = {s}
    frontier = {s}
    for _ in range(k):
        nxt = set()
        for u in frontier:
            for i in range(len(u)):
                v = u[:i] + u[i + 1:]
                if v not in seen:
                    seen.add(v)
                    nxt.add(v)
        frontier = nxt
    return seen


def editdist_selfjoin(ds, col: str, k: int = 2, num_buckets: int = 64):
    """Exact edit-distance self-join over DISTINCT values of ``col``.

    Returns a Dataset of (name_a, name_b, dist) with name_a < name_b
    and lev(name_a, name_b) <= k.  Four collapses, each a bucketed
    pandas group body (CLAUDE.md lesson #1):

    1. distinct values (per-batch Arrow unique -> hash-bucket dedup);
    2. deletion-variant expansion (per-VOCAB-entry Python, bounded by
       O(len^k) variants per distinct value — vocabulary-sized, never
       corpus-sized);
    3. candidate pairs = equi-join on the variant hash inside each
       hash bucket (pandas self-merge in C);
    4. pair-bucket global dedup + inline DP-Levenshtein verify on the
       candidates only (hash collisions and FastSS false positives
       both die here).
    """

    def pdistinct(t: pa.Table) -> pa.Table:
        vals = pc.unique(pc.drop_null(t.column(col)))
        h = content_hash64(vals.to_pylist())
        return pa.table({
            "name": vals.cast(pa.string()),
            "_bucket": pa.array((h % num_buckets).astype(np.int64)),
        })

    def gdistinct(g: pd.DataFrame) -> pd.DataFrame:
        return g[["name"]].drop_duplicates()

    def variants(t: pa.Table) -> pa.Table:
        names, vhs = [], []
        for s in t.column("name").to_pylist():
            nb = _deletion_neighborhood(s, k)
            h = content_hash64(sorted(nb))
            names.extend([s] * len(nb))
            vhs.append(h)
        vh = (np.concatenate(vhs) if vhs
              else np.empty(0, dtype=np.int64))
        return pa.table({
            "name": pa.array(names, pa.string()),
            "_vh": pa.array(vh, pa.int64()),
            "_bucket": pa.array(vh % num_buckets, pa.int64()),
        })

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="_vh", suffixes=("_a", "_b"))
        m = m[m["name_a"] < m["name_b"]]
        m = m[["name_a", "name_b"]].drop_duplicates()
        m["_pb"] = ((content_hash64(list(m["name_a"])) * 31
                     + content_hash64(list(m["name_b"])))
                    % num_buckets).astype("int64")
        return m

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["name_a", "name_b"]].drop_duplicates()
        d = np.fromiter(
            (levenshtein(a, b)
             for a, b in zip(g["name_a"], g["name_b"])),
            dtype=np.int64, count=len(g))
        g = g.assign(dist=d)
        return g[g["dist"] <= k]

    return (ds.map_batches(pdistinct, batch_format="pyarrow")
            .groupby("_bucket").map_groups(gdistinct,
                                           batch_format="pandas")
            .map_batches(variants, batch_format="pyarrow")
            .groupby("_bucket").map_groups(pairs,
                                           batch_format="pandas")
            .groupby("_pb").map_groups(verify, batch_format="pandas"))


def local_skyline2d(df: pd.DataFrame, min_col: str,
                    max_col: str) -> pd.DataFrame:
    """Vectorized 2-D skyline of one pandas frame: keep rows not
    dominated (other row <= on min_col, >= on max_col, strict on at
    least one).  Ties on BOTH axes all survive (SQL NOT EXISTS rule).
    Both columns must be integer-valued (callers pass cents/sizes)."""
    if df.empty:
        return df
    gmax = df.groupby(min_col)[max_col].transform("max")
    df = df[df[max_col] == gmax]
    u = (df[[min_col, max_col]].drop_duplicates(min_col)
         .sort_values(min_col))
    prev = u[max_col].cummax().shift(1, fill_value=_NEG)
    keep = u.loc[u[max_col].to_numpy() > prev.to_numpy(), min_col]
    return df[df[min_col].isin(set(keep))]


def skyline2d(ds, min_col: str, max_col: str) -> pd.DataFrame:
    """Distributed 2-D Pareto frontier: per-batch local skyline
    (a point dominated within a block is dominated globally, so local
    filtering is lossless), then one driver-side re-filter of the
    small union.  Driver memory is O(sum of local skylines), bounded
    by blocks x distinct(max_col) — never O(n)."""

    def local(df: pd.DataFrame) -> pd.DataFrame:
        return local_skyline2d(df, min_col, max_col)

    part = ds.map_batches(local, batch_format="pandas").to_pandas()
    if part.shape[1] == 0:
        return part
    return local_skyline2d(part, min_col, max_col)


def setsim_join(ds, *, id_col, item_col, t_num: int = 1,
                t_den: int = 2, num_buckets: int = 64):
    """PPJoin-style set-similarity self-join over an EXPLODED
    (id, item) relation: pairs of sets with Jaccard >= t_num/t_den.
    Returns a Dataset of (id_a, id_b, n_common, n_union).

    The candidate generator is the PREFIX FILTER [Xiao et al.,
    "Efficient Similarity Joins for Near Duplicate Detection", 2008]:
    order every set's items by global rarity (df asc), keep only the
    first L - ceil(t*L) + 1 items per set — two sets with
    Jaccard >= t MUST share a prefix token, so candidates form in the
    prefix-token equi-join instead of the full inverted index.  With
    rarity ordering the hottest tokens never key a shuffle group.

    Shape: all integer keys, five bucketed pandas exchanges —
    (1) item-keyed global df (vocab-sized output, broadcast as a
    closure map — vocabulary-scale by assumption, like every df
    broadcast in this repo); (2) id-keyed prefix emission; (3)
    prefix-token candidate pairs (length-filtered: min(L)*t_den >=
    max(L)*t_num); (4) id-keyed item gather for candidate members —
    duplicate pairs collapse here for free (identical member rows land
    in the same id bucket); (5) pair-keyed intersection count +
    threshold verify (merge on item — never an items_a x items_b
    cross product).
    """

    def pdist(t: pa.Table) -> pa.Table:
        g = t.group_by([id_col, item_col]).aggregate([])
        oid = g.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        item = g.column(item_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"oid": pa.array(oid), "item": pa.array(item)})

    dist = ds.map_batches(pdist, batch_format="pyarrow")

    # -- (1) global df per item: vocab-sized, collected + broadcast --
    def by_item(t: pa.Table) -> pa.Table:
        return t.append_column("_bucket", pa.array(
            t.column("item").to_numpy(zero_copy_only=False)
            .astype(np.int64) % num_buckets))

    def dfs(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["oid", "item"]].drop_duplicates()
        out = g.groupby("item", as_index=False).agg(df=("oid", "count"))
        return out.astype({"item": "int64", "df": "int64"})

    df_pd = (dist.map_batches(by_item, batch_format="pyarrow")
             .groupby("_bucket").map_groups(dfs, batch_format="pandas")
             .to_pandas())
    df_map = (dict(zip(df_pd["item"], df_pd["df"]))
              if "item" in df_pd.columns else {})

    # -- (2) id-keyed prefix emission -------------------------------
    def by_oid(t: pa.Table) -> pa.Table:
        return t.append_column("_bucket", pa.array(
            t.column("oid").to_numpy(zero_copy_only=False)
            .astype(np.int64) % num_buckets))

    def prefix(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["oid", "item"]].drop_duplicates()
        if not len(g):
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in ("item", "oid", "L",
                                           "_bucket")})
        g = g.assign(df=g["item"].map(df_map).fillna(1).astype("int64"))
        g = g.sort_values(["oid", "df", "item"])
        L = g.groupby("oid")["item"].transform("size") \
            .to_numpy(dtype=np.int64)
        rank = g.groupby("oid").cumcount().to_numpy(dtype=np.int64)
        p = L - ((t_num * L + t_den - 1) // t_den) + 1
        keep = rank < p
        out = g.loc[keep, ["item", "oid"]].astype("int64")
        out["L"] = L[keep]
        out["_bucket"] = (out["item"] % num_buckets).astype("int64")
        return out

    prefixes = (dist.map_batches(by_oid, batch_format="pyarrow")
                .groupby("_bucket").map_groups(prefix,
                                               batch_format="pandas"))

    # -- (3) prefix-token candidate pairs + length filter ------------
    def cands(g: pd.DataFrame) -> pd.DataFrame:
        cols = ("oid_a", "oid_b", "L_a", "L_b", "_bucket")
        empty = pd.DataFrame({c: pd.Series([], dtype="int64")
                              for c in cols})
        if not len(g):
            return empty
        m = g.merge(g, on="item", suffixes=("_a", "_b"))
        m = m[m["oid_a"] < m["oid_b"]]
        if not len(m):
            return empty
        la = m["L_a"].to_numpy(dtype=np.int64)
        lb = m["L_b"].to_numpy(dtype=np.int64)
        m = m[np.minimum(la, lb) * t_den >= np.maximum(la, lb) * t_num]
        m = m[["oid_a", "oid_b", "L_a", "L_b"]] \
            .drop_duplicates(["oid_a", "oid_b"]).astype("int64")
        m["_bucket"] = ((m["oid_a"] * 1_000_003 + m["oid_b"])
                        % num_buckets).astype("int64")
        return m

    pair_cands = prefixes.groupby("_bucket").map_groups(
        cands, batch_format="pandas")

    # -- (4) id-keyed member-item gather (pair dedup rides along) ----
    def explode_members(t: pa.Table) -> pa.Table:
        a = t.column("oid_a").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        b = t.column("oid_b").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        la = t.column("L_a").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        lb = t.column("L_b").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        doc = np.concatenate([a, b])
        return pa.table({
            "doc": pa.array(doc),
            "pa_": pa.array(np.concatenate([a, a])),
            "pb_": pa.array(np.concatenate([b, b])),
            "la_": pa.array(np.concatenate([la, la])),
            "lb_": pa.array(np.concatenate([lb, lb])),
            "side": pa.array(np.concatenate(
                [np.zeros(len(a), np.int8), np.ones(len(b), np.int8)])),
            "item": pa.nulls(len(doc), pa.int64()),
            "_bucket": pa.array(doc % num_buckets)})

    def src_rows(t: pa.Table) -> pa.Table:
        oid = t.column("oid").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = len(oid)
        return pa.table({
            "doc": pa.array(oid),
            "pa_": pa.nulls(n, pa.int64()),
            "pb_": pa.nulls(n, pa.int64()),
            "la_": pa.nulls(n, pa.int64()),
            "lb_": pa.nulls(n, pa.int64()),
            "side": pa.array(np.full(n, -1, np.int8)),
            "item": t.column("item").cast(pa.int64()),
            "_bucket": pa.array(oid % num_buckets)})

    def gather(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"pa_": "int64", "pb_": "int64", "la_": "int64",
                "lb_": "int64", "side": "int8", "item": "int64",
                "_pb": "int64"}
        empty = pd.DataFrame({c: pd.Series([], dtype=d)
                              for c, d in cols.items()})
        srcs = g.loc[g["side"] == -1, ["doc", "item"]]
        mem = g.loc[g["side"] >= 0,
                    ["doc", "pa_", "pb_", "la_", "lb_", "side"]] \
            .drop_duplicates()
        if not len(mem) or not len(srcs):
            return empty
        srcs = srcs.copy()
        srcs["doc"] = srcs["doc"].astype("int64")
        srcs["item"] = srcs["item"].astype("int64")
        srcs = srcs.drop_duplicates()
        mem = mem.astype({"doc": "int64", "pa_": "int64",
                          "pb_": "int64", "la_": "int64",
                          "lb_": "int64"})
        m = mem.merge(srcs, on="doc")
        if not len(m):
            return empty
        m["_pb"] = ((m["pa_"] * 1_000_003 + m["pb_"])
                    % num_buckets).astype("int64")
        return m[["pa_", "pb_", "la_", "lb_", "side", "item", "_pb"]]

    gathered = (pair_cands.map_batches(explode_members,
                                       batch_format="pyarrow")
                .union(dist.map_batches(src_rows,
                                        batch_format="pyarrow"))
                .groupby("_bucket")
                .map_groups(gather, batch_format="pandas"))

    # -- (5) intersection count + threshold verify -------------------
    def verify(g: pd.DataFrame) -> pd.DataFrame:
        cols = ("id_a", "id_b", "n_common", "n_union")
        empty = pd.DataFrame({c: pd.Series([], dtype="int64")
                              for c in cols})
        if not len(g):
            return empty
        a = g.loc[g["side"] == 0, ["pa_", "pb_", "la_", "lb_", "item"]]
        b = g.loc[g["side"] == 1, ["pa_", "pb_", "item"]]
        if not len(a) or not len(b):
            return empty
        inter = (a.merge(b, on=["pa_", "pb_", "item"])
                 .groupby(["pa_", "pb_"], as_index=False)
                 .agg(n_common=("item", "count")))
        sizes = a[["pa_", "pb_", "la_", "lb_"]].drop_duplicates()
        m = inter.merge(sizes, on=["pa_", "pb_"])
        u = (m["la_"] + m["lb_"] - m["n_common"]).astype("int64")
        m = m.assign(n_union=u)
        m = m[m["n_common"] * t_den >= t_num * m["n_union"]]
        out = m.rename(columns={"pa_": "id_a", "pb_": "id_b"})
        return out[list(cols)].astype("int64")

    return gathered.groupby("_pb").map_groups(verify,
                                              batch_format="pandas")
