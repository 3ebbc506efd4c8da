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

    Shape: all integer keys, four bucketed pandas exchanges —
    (1) item-keyed global df (vocab-sized output, broadcast as a
    closure map — vocabulary-scale by assumption, like every df
    broadcast in this repo); (2) id-keyed prefix emission, where each
    prefix row CARRIES its set packed to int64-LE bytes (sets are
    small by the problem's nature — baskets, shingle samples — so the
    payload rides the one candidate shuffle instead of paying a
    second corpus gather, CLAUDE.md lesson #9); (3) candidates +
    INLINE verify in one prefix-token group: length filter
    (min(L)*t_den >= max(L)*t_num), PPJoin positional filter
    (overlap upper bound from the matched prefix positions — per-row
    pruning is lossless because a qualifying pair passes at every
    matched row), then blob unpack + pandas merge ON item for the
    exact intersection count — never an items_a x items_b cross
    product; (4) a pair-keyed dedup over the tiny verified table (the
    same pair can surface in several prefix-token buckets).
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
        """Prefix rows for one id bucket: (item, oid, L, pos, blob)
        where blob is the oid's FULL item set, item-sorted, packed to
        little-endian int64 bytes — it rides the candidate shuffle so
        verification never needs a second corpus gather."""
        empty = pa.table({"item": pa.array([], pa.int64()),
                          "oid": pa.array([], pa.int64()),
                          "L": pa.array([], pa.int64()),
                          "pos": pa.array([], pa.int64()),
                          "blob": pa.array([], pa.binary()),
                          "_bucket": pa.array([], pa.int64())})
        g = g[["oid", "item"]].drop_duplicates()
        if not len(g):
            return empty
        # canonical item-sorted layout -> one contiguous buffer, one
        # C-level bytes slice per id (no per-item Python)
        g = g.sort_values(["oid", "item"])
        flat = np.ascontiguousarray(
            g["item"].to_numpy(dtype=np.int64))
        oid_sorted = g["oid"].to_numpy(dtype=np.int64)
        uniq, starts, counts = np.unique(
            oid_sorted, return_index=True, return_counts=True)
        buf = flat.tobytes()
        blobs = {int(o): buf[8 * s: 8 * (s + c)]
                 for o, s, c in zip(uniq, starts, counts)}
        # rarity order for the prefix
        g = g.assign(df=g["item"].map(df_map).fillna(1).astype("int64"))
        g = g.sort_values(["oid", "df", "item"])
        L = g.groupby("oid")["item"].transform("size") \
            .to_numpy(dtype=np.int64)
        rank = g.groupby("oid").cumcount().to_numpy(dtype=np.int64)
        p = L - ((t_num * L + t_den - 1) // t_den) + 1
        keep = rank < p
        out = g.loc[keep, ["item", "oid"]].astype("int64")
        out["L"] = L[keep]
        out["pos"] = rank[keep]
        return pa.table({
            "item": pa.array(out["item"].to_numpy(np.int64)),
            "oid": pa.array(out["oid"].to_numpy(np.int64)),
            "L": pa.array(out["L"].to_numpy(np.int64)),
            "pos": pa.array(out["pos"].to_numpy(np.int64)),
            "blob": pa.array([blobs[int(o)] for o in out["oid"]],
                             pa.binary()),
            "_bucket": pa.array(out["item"].to_numpy(np.int64)
                                % num_buckets)})

    prefixes = (dist.map_batches(by_oid, batch_format="pyarrow")
                .groupby("_bucket").map_groups(prefix,
                                               batch_format="pandas"))

    # -- (3) candidates + inline verify in ONE prefix-token group ----
    def cands_verify(g: pd.DataFrame) -> pd.DataFrame:
        cols = ("id_a", "id_b", "n_common", "n_union", "_pb")
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
        pa_pos = m["pos_a"].to_numpy(dtype=np.int64)
        pb_pos = m["pos_b"].to_numpy(dtype=np.int64)
        # length filter: J <= min/max
        ok = np.minimum(la, lb) * t_den >= np.maximum(la, lb) * t_num
        # positional filter (PPJoin): for ANY shared prefix token at
        # positions (pa, pb), overlap <= min(pa, pb) (shared among the
        # tokens before it) + min(La-pa, Lb-pb) (it + the tails); a
        # true pair has overlap >= alpha, so EVERY one of its matched
        # rows passes — per-row pruning loses no pair
        alpha = (t_num * (la + lb) + (t_num + t_den) - 1) \
            // (t_num + t_den)
        ubound = (np.minimum(pa_pos, pb_pos)
                  + np.minimum(la - pa_pos, lb - pb_pos))
        m = m[ok & (ubound >= alpha)]
        if not len(m):
            return empty
        m = m.drop_duplicates(["oid_a", "oid_b"])
        # inline verify: unpack both blobs (one C-level join each),
        # count shared items with a pandas merge ON item — never an
        # items_a x items_b cross product
        na = (m["L_a"].to_numpy(dtype=np.int64))
        nb_ = (m["L_b"].to_numpy(dtype=np.int64))
        ia = np.frombuffer(b"".join(m["blob_a"]), dtype=np.int64)
        ib = np.frombuffer(b"".join(m["blob_b"]), dtype=np.int64)
        ridx = np.arange(len(m), dtype=np.int64)
        da = pd.DataFrame({"r": np.repeat(ridx, na), "item": ia})
        db = pd.DataFrame({"r": np.repeat(ridx, nb_), "item": ib})
        inter = (da.merge(db, on=["r", "item"])
                 .groupby("r").size())
        cnt = np.zeros(len(m), dtype=np.int64)
        cnt[inter.index.to_numpy()] = inter.to_numpy()
        union = na + nb_ - cnt
        keep = cnt * t_den >= t_num * union
        out = pd.DataFrame({
            "id_a": m["oid_a"].to_numpy(dtype=np.int64)[keep],
            "id_b": m["oid_b"].to_numpy(dtype=np.int64)[keep],
            "n_common": cnt[keep], "n_union": union[keep]})
        out["_pb"] = ((out["id_a"] * 1_000_003 + out["id_b"])
                      % num_buckets).astype("int64")
        return out

    verified = prefixes.groupby("_bucket").map_groups(
        cands_verify, batch_format="pandas")

    # -- (4) tiny global pair dedup (a pair can be found via prefix
    # tokens living in different hash buckets) ------------------------
    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        cols = ["id_a", "id_b", "n_common", "n_union"]
        if not len(g):
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in cols})
        return g[cols].drop_duplicates(["id_a", "id_b"]) \
            .astype("int64")

    return verified.groupby("_pb").map_groups(dedup_pairs,
                                              batch_format="pandas")
