"""Deduplication operators over a documents Dataset.

Five flavors, each a Ray-Data composition (SURVEY.md §2.6 maps the
reference's dedup layer; these generalize it for training-data scale):

- exact:       content-hash -> groupby(hash) -> keep first (min id)
- minhash-LSH: shingle -> minhash -> band rows -> groupby(band,value)
               -> candidate pairs -> exact-Jaccard verify
- simhash:     64-bit signature column (+ near-pair scan by Hamming)
- n-gram Jaccard: exact blocked all-pairs via shared-shingle join
- embedding cosine: near-dup pairs over an embedding column

Scale notes: every pairing step is keyed (hash/band/shingle) so it
shuffles by key instead of forming a cross product; partial
aggregation happens inside map_batches before any groupby; candidate
verification is row-local.  Hot keys (a shingle shared by thousands of
docs) are capped with a per-key candidate limit — at 100 TB you salt
or drop top-frequency shingles (document-frequency cut), which is the
standard recall/cost trade.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from hepcrawl_ray.ops import text as T


# ---------------------------------------------------------------- exact ----

def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """One row per distinct text, keeping the smallest id
    (deterministic winner).  Returns columns (id_col, text_col).

    Partial min per batch (combiner) then one built-in grouped Min —
    no per-group Python (map_groups costs ~0.5 ms per group)."""
    from ray.data.aggregate import Min

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(text_col).aggregate([(id_col, "min")])
        return g.rename_columns([text_col, "_pmin"])

    out = (ds.select_columns([id_col, text_col])
           .map_batches(partial, batch_format="pyarrow")
           .groupby(text_col)
           .aggregate(Min("_pmin", alias_name=id_col)))
    return out


# ---------------------------------------------------------- minhash LSH ----

class MinHashStage:
    """Actor-pool UDF: minhash signatures + banded LSH keys per doc."""

    def __init__(self, num_perm=64, bands=16, k_shingle=3,
                 id_col="doc_id", text_col="text"):
        self.a, self.b = T.minhash_params(num_perm)
        self.num_perm, self.bands = num_perm, bands
        self.rows_per_band = num_perm // bands
        self.k = k_shingle
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        from hashlib import blake2b

        out_id, out_band, out_val = [], [], []
        for i, t in zip(ids, texts):
            sig = T.minhash_signature(t, self.a, self.b, self.k)
            for b in range(self.bands):
                chunk = sig[b * self.rows_per_band:(b + 1) * self.rows_per_band]
                # band value: stable 64-bit digest of the band's slots
                val = int.from_bytes(
                    blake2b(np.ascontiguousarray(chunk).tobytes(),
                            digest_size=8).digest(), "little")
                out_id.append(i)
                out_band.append(b)
                out_val.append(val - (1 << 64) if val >= (1 << 63) else val)
        return pa.table({"doc_id": out_id, "band": out_band,
                         "band_val": out_val})


def minhash_lsh_pairs(ds, *, num_perm=64, bands=16, k_shingle=3,
                      threshold=0.5, id_col="doc_id", text_col="text",
                      max_bucket=64, concurrency=4):
    """Candidate pairs from banded MinHash, verified by exact Jaccard.

    Returns (doc_a, doc_b) with doc_a < doc_b and token-shingle
    Jaccard >= threshold.  ``max_bucket`` caps pathological buckets
    (hot-key guard; see module docstring).
    """
    import ray

    texts_ref = ray.put(
        {r[id_col]: r[text_col]
         for r in ds.select_columns([id_col, text_col]).take_all()})

    band_rows = ds.select_columns([id_col, text_col]).map_batches(
        MinHashStage,
        fn_constructor_kwargs=dict(num_perm=num_perm, bands=bands,
                                   k_shingle=k_shingle, id_col=id_col,
                                   text_col=text_col),
        batch_format="pyarrow", concurrency=(1, concurrency), num_cpus=0.5)

    n_hash_buckets = 64

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = (batch.column("band_val").to_numpy() % n_hash_buckets)
        return batch.append_column("bucket", pa.array(b.astype(np.int64)))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """Candidate pairs within one hash bucket of (band, band_val)
        groups — pandas self-merge, with a per-group size cap
        (hot-key guard)."""
        sizes = g.groupby(["band", "band_val"])["doc_id"].transform("size")
        g = g[(sizes >= 2) & (sizes <= max_bucket)]
        if not len(g):
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64")})
        m = g.merge(g, on=["band", "band_val"])
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        out = m[["doc_id_x", "doc_id_y"]].drop_duplicates()
        out.columns = ["doc_a", "doc_b"]
        return out

    cands = (band_rows.map_batches(add_bucket, batch_format="pyarrow")
             .groupby("bucket")
             .map_groups(bucket_pairs, batch_format="pandas"))

    class VerifyJaccard:
        def __init__(self):
            self.texts = ray.get(texts_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            if not len(batch):
                return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                     "doc_b": pd.Series([], dtype="int64"),
                                     "jaccard": pd.Series([], dtype="float64")})
            jac = [T.jaccard_tokens(self.texts[a], self.texts[b], k_shingle)
                   for a, b in zip(batch["doc_a"], batch["doc_b"])]
            batch = batch.assign(jaccard=jac)
            return batch.loc[batch["jaccard"] >= threshold,
                             ["doc_a", "doc_b", "jaccard"]]

    # cross-band/bucket duplicates of the same pair: built-in grouped
    # count collapses them to one row, then verification is row-local
    from ray.data.aggregate import Count

    distinct = cands.groupby(["doc_a", "doc_b"]).aggregate(
        Count(alias_name="_nbands"))

    verified = distinct.map_batches(VerifyJaccard, batch_format="pandas",
                                    concurrency=(1, concurrency), num_cpus=0.5)
    return verified


# -------------------------------------------------------------- simhash ----

def simhash_signatures(ds, id_col="doc_id", text_col="text", concurrency=4):
    """(id, simhash:int64) per document."""
    def sig(batch: pa.Table) -> pa.Table:
        s = T.simhash64(batch.column(text_col).to_pylist())
        return pa.table({id_col: batch.column(id_col),
                         "simhash": pa.array(s, type=pa.int64())})

    return ds.select_columns([id_col, text_col]).map_batches(
        sig, batch_format="pyarrow")


# ------------------------------------------------------- n-gram Jaccard ----

def ngram_jaccard_pairs(ds, *, k_shingle=3, threshold=0.5,
                        id_col="doc_id", text_col="text",
                        max_shingle_df=256, concurrency=4):
    """EXACT Jaccard >= threshold pairs via shared-shingle blocking.

    Identical result to all-pairs Jaccard (any pair with J >= t > 0
    shares >= 1 shingle, so blocking loses nothing); cost is bounded by
    dropping shingles with document frequency > ``max_shingle_df``
    (a pair blocked *only* by ultra-common shingles can be missed —
    the documented recall trade; set it high enough for the corpus).
    SQL-expressible -> has a DuckDB oracle.
    """
    import ray

    doc_rows = ds.select_columns([id_col, text_col]).take_all()
    texts = {r[id_col]: r[text_col] for r in doc_rows}
    nsh = {r[id_col]: len(set(T.shingles(r[text_col], k_shingle)))
           for r in doc_rows}
    texts_ref = ray.put((texts, nsh))

    def explode(batch: pa.Table) -> pa.Table:
        ids, vals = [], []
        for i, t in zip(batch.column(id_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            for s in set(T.shingles(t, k_shingle)):
                ids.append(i)
                vals.append(s)
        return pa.table({"doc_id": ids, "shingle": vals})

    n_buckets = 64

    def add_bucket(batch: pa.Table) -> pa.Table:
        h = T.content_hash64(batch.column("shingle").to_pylist())
        return batch.append_column(
            "bucket", pa.array((h % n_buckets).astype(np.int64)))

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        """All pair partial-counts within one shingle-hash bucket.

        A shingle lives in exactly one bucket, so the per-shingle
        document-frequency cut is exact here; the pandas self-merge and
        groupby are C-speed (vs. one Python call per shingle group)."""
        df = g.groupby("shingle")["doc_id"].transform("size")
        g = g[(df >= 2) & (df <= max_shingle_df)]
        if not len(g):
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64"),
                                 "pn": pd.Series([], dtype="int64")})
        m = g.merge(g, on="shingle")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        out = (m.groupby(["doc_id_x", "doc_id_y"]).size()
               .reset_index(name="pn"))
        out.columns = ["doc_a", "doc_b", "pn"]
        # re-bucket by PAIR for the cross-bucket count merge (Ray's
        # grouped aggregate over millions of distinct keys is ~100x
        # slower than 64 pandas group-sums)
        out["pair_bucket"] = ((out["doc_a"] * 1_000_003 + out["doc_b"])
                              % n_buckets).astype("int64")
        return out

    def sum_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["doc_a", "doc_b"], as_index=False)["pn"].sum()
               .rename(columns={"pn": "n"}))
        return out

    exploded = ds.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow").map_batches(
        add_bucket, batch_format="pyarrow")
    counted = (exploded.groupby("bucket")
               .map_groups(pairs_in_bucket, batch_format="pandas")
               .groupby("pair_bucket")
               .map_groups(sum_pairs, batch_format="pandas"))

    class Finalize:
        def __init__(self):
            self.texts, self.nsh = ray.get(texts_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            if not len(batch):
                return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                     "doc_b": pd.Series([], dtype="int64")})
            keep = []
            for a, b, n_common in zip(batch["doc_a"], batch["doc_b"], batch["n"]):
                den = self.nsh[a] + self.nsh[b] - n_common
                if den > 0 and n_common / den >= threshold:
                    keep.append((a, b))
            return pd.DataFrame(keep, columns=["doc_a", "doc_b"]) if keep \
                else pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                   "doc_b": pd.Series([], dtype="int64")})

    return counted.map_batches(Finalize, batch_format="pandas",
                               concurrency=(1, concurrency), num_cpus=0.5)


# ---------------------------------------------------- embedding cosine ----

def embedding_neardup_pairs(ds, *, threshold=0.95, id_col="vec_id",
                            vec_col="embedding", block_col=None,
                            max_ids=None, concurrency=4):
    """Near-duplicate pairs by cosine similarity.

    Baseline: broadcast the (optionally truncated) normalized matrix,
    compare each batch against it with one matmul (numpy), emit pairs
    (a < b, cos >= threshold).  The scale path buckets by ``block_col``
    (or an LSH sign-bucket) first; here the broadcast matrix IS the
    documented partitioning assumption for the sandbox sizes.
    """
    import ray

    src = ds.select_columns([c for c in (id_col, vec_col, block_col) if c])
    if max_ids is not None:
        src = src.map_batches(
            lambda t: t.filter(pa.compute.less(t.column(id_col), max_ids)),
            batch_format="pyarrow")
    rows = src.take_all()
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    mat = np.array([r[vec_col] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    mat = mat / norms[:, None]
    ref = ray.put((ids, mat))

    class PairFinder:
        def __init__(self):
            self.ids, self.mat = ray.get(ref)
            self.pos = {int(i): p for p, i in enumerate(self.ids)}

        def __call__(self, batch: pa.Table) -> pa.Table:
            bids = batch.column(id_col).to_pylist()
            vecs = np.array(batch.column(vec_col).to_pylist(), dtype=np.float64)
            n = np.linalg.norm(vecs, axis=1)
            n[n == 0] = 1.0
            vecs = vecs / n[:, None]
            sims = vecs @ self.mat.T
            out_a, out_b = [], []
            for r, i in enumerate(bids):
                if int(i) not in self.pos:
                    continue
                hits = np.nonzero(sims[r] >= threshold)[0]
                for c in hits:
                    j = int(self.ids[c])
                    if int(i) < j:
                        out_a.append(int(i))
                        out_b.append(j)
            return pa.table({"vec_a": pa.array(out_a, type=pa.int64()),
                             "vec_b": pa.array(out_b, type=pa.int64())})

    return src.map_batches(PairFinder, batch_format="pyarrow",
                           concurrency=(1, concurrency), num_cpus=0.5)


def embedding_lsh_neardup_pairs(ds, *, threshold=0.4, id_col="vec_id",
                                vec_col="embedding", n_planes=4,
                                n_tables=16, seed=42, concurrency=4,
                                max_bucket=512):
    """Scale path for embedding near-dup: sign-random-projection LSH.

    Each vector gets ``n_tables`` bucket keys (sign pattern of
    ``n_planes`` random projections); candidate pairs share a bucket in
    ANY table; exact cosine verifies.  No broadcast matrix, no cross
    product — cost is keyed by bucket like the text-LSH path.
    Approximate by construction (recall grows with n_tables; collision
    prob per table = (1 - theta/pi)^n_planes — size planes/tables for
    the target threshold: high-threshold near-dup (cos >= 0.9) affords
    many planes; looser thresholds need few planes / many tables).
    """
    import ray

    # deterministic projection planes; dim inferred from the first row
    first = ds.take(1)[0]
    dim = len(first[vec_col])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))
    planes_ref = ray.put(planes)

    vecs_rows = ds.select_columns([id_col, vec_col]).take_all()
    ids = np.array([r[id_col] for r in vecs_rows], dtype=np.int64)
    mat = np.array([r[vec_col] for r in vecs_rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    mat = mat / norms[:, None]
    lookup_ref = ray.put((ids, mat))

    class BucketKeys:
        def __init__(self):
            self.planes = ray.get(planes_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            v = np.array(t.column(vec_col).to_pylist(), dtype=np.float64)
            n = np.linalg.norm(v, axis=1)
            n[n == 0] = 1.0
            v = v / n[:, None]
            out_id, out_tab, out_key = [], [], []
            idl = t.column(id_col).to_pylist()
            for tab in range(len(self.planes)):
                signs = (v @ self.planes[tab].T) > 0           # (n, planes)
                keys = (signs * (1 << np.arange(signs.shape[1]))).sum(axis=1)
                out_id.extend(int(x) for x in idl)
                out_tab.extend([tab] * len(idl))
                out_key.extend(int(k) for k in keys)
            return pa.table({"vec_id": pa.array(out_id, pa.int64()),
                             "table": pa.array(out_tab, pa.int32()),
                             "key": pa.array(out_key, pa.int64())})

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby(["table", "key"])["vec_id"].transform("size")
        g = g[(sizes >= 2) & (sizes <= max_bucket)]
        if not len(g):
            return pd.DataFrame({"vec_a": pd.Series([], dtype="int64"),
                                 "vec_b": pd.Series([], dtype="int64")})
        m = g.merge(g, on=["table", "key"])
        m = m[m["vec_id_x"] < m["vec_id_y"]]
        out = m[["vec_id_x", "vec_id_y"]].drop_duplicates()
        out.columns = ["vec_a", "vec_b"]
        # re-bucket by pair for the cross-table distinct (Ray grouped
        # aggregates over high-cardinality keys are ~100x slower than
        # 64 pandas dedups)
        out["pair_bucket"] = ((out["vec_a"] * 1_000_003 + out["vec_b"])
                              % 64).astype("int64")
        return out

    def add_bucket(t: pa.Table) -> pa.Table:
        b = (t.column("key").to_numpy() * 31 + t.column("table").to_numpy()) % 64
        return t.append_column("bucket", pa.array(b.astype(np.int64)))

    def distinct_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g[["vec_a", "vec_b"]].drop_duplicates()

    cands = (ds.select_columns([id_col, vec_col])
             .map_batches(BucketKeys, batch_format="pyarrow",
                          concurrency=(1, concurrency), num_cpus=0.5)
             .map_batches(add_bucket, batch_format="pyarrow")
             .groupby("bucket")
             .map_groups(bucket_pairs, batch_format="pandas")
             .groupby("pair_bucket")
             .map_groups(distinct_pairs, batch_format="pandas"))

    class VerifyCosine:
        def __init__(self):
            self.ids, self.mat = ray.get(lookup_ref)
            self.pos = {int(i): p for p, i in enumerate(self.ids)}

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            if not len(batch):
                return pd.DataFrame({"vec_a": pd.Series([], dtype="int64"),
                                     "vec_b": pd.Series([], dtype="int64")})
            keep = []
            for a, b in zip(batch["vec_a"], batch["vec_b"]):
                pa_, pb_ = self.pos.get(int(a)), self.pos.get(int(b))
                if pa_ is None or pb_ is None:
                    continue
                if float(self.mat[pa_] @ self.mat[pb_]) >= threshold:
                    keep.append((int(a), int(b)))
            return pd.DataFrame(keep, columns=["vec_a", "vec_b"]) if keep \
                else pd.DataFrame({"vec_a": pd.Series([], dtype="int64"),
                                   "vec_b": pd.Series([], dtype="int64")})

    return cands.map_batches(VerifyCosine, batch_format="pandas",
                             concurrency=(1, concurrency), num_cpus=0.5)
