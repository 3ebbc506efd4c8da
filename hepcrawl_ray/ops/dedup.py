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


def attach_pair_values(pairs, src, *, key_a, key_b, src_key, val_col,
                       num_buckets=64, distinct=False):
    """Attach ``src[val_col]`` for both members of a candidate-pair
    table (output columns ``{val_col}_a`` / ``{val_col}_b``).

    This is the scale path for pair *verification*: no worker or
    driver ever holds the whole corpus — values (texts / vectors /
    counts) move only for candidate pairs, hash-partitioned by key.

    Implemented as two bucketed gather shuffles (the repo's
    union + groupby(bucket) + pandas-merge hash join) rather than
    ``Dataset.join``: Ray's join operator builds a schema-less empty
    table for any shuffle partition that received no left rows and
    crashes resolving the key (sparse candidate tables hit this
    constantly), and its per-partition aggregator actors cost more in
    startup than they return at candidate-table sizes.
    Shuffle 1 keys by doc id (gather each member's value); shuffle 2
    keys by pair (zip the two members back together).  Skew is capped
    by ``num_buckets`` pandas-side groups, exactly like the LSH
    candidate stages.

    ``distinct=True`` also deduplicates the pair table en route, FREE
    of an extra shuffle: duplicate pairs explode to byte-identical
    member rows that always land in the same doc bucket, so a
    ``drop_duplicates`` inside the gather group is globally exact.
    Callers that previously ran a dedicated distinct-pairs groupby
    can drop that whole stage."""
    ss = src.schema(fetch_if_missing=True)
    val_type = dict(zip(ss.names, ss.types))[val_col]
    if not isinstance(val_type, pa.DataType):
        # pandas-block sources report numpy dtypes / python classes
        _py = {str: pa.string(), bytes: pa.binary(),
               int: pa.int64(), float: pa.float64(), bool: pa.bool_()}
        if val_type in _py:
            val_type = _py[val_type]
        else:
            dt = np.dtype(val_type)
            val_type = (pa.string() if dt == np.dtype(object)
                        else pa.from_numpy_dtype(dt))

    def explode_pairs(t: pa.Table) -> pa.Table:
        a = t.column(key_a).to_numpy().astype(np.int64)
        b = t.column(key_b).to_numpy().astype(np.int64)
        doc = np.concatenate([a, b])
        return pa.table({
            "doc": doc,
            "pa_": np.concatenate([a, a]),
            "pb_": np.concatenate([b, b]),
            "member": np.concatenate([np.zeros(len(a), np.int8),
                                      np.ones(len(b), np.int8)]),
            "val": pa.nulls(len(doc), val_type),
            "bucket": (doc % num_buckets).astype(np.int64),
        })

    def prep_src(t: pa.Table) -> pa.Table:
        d = t.column(src_key).to_numpy().astype(np.int64)
        n = len(d)
        return pa.table({
            "doc": d,
            "pa_": pa.nulls(n, pa.int64()),
            "pb_": pa.nulls(n, pa.int64()),
            "member": np.full(n, -1, dtype=np.int8),
            "val": t.column(val_col),
            "bucket": (d % num_buckets).astype(np.int64),
        })

    unioned = (pairs.map_batches(explode_pairs, batch_format="pyarrow")
               .union(src.map_batches(prep_src, batch_format="pyarrow")))

    def gather(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"pa_": pd.Series([], dtype="int64"),
                              "pb_": pd.Series([], dtype="int64"),
                              "member": pd.Series([], dtype="int8"),
                              "val": pd.Series([], dtype="object"),
                              "pair_bucket": pd.Series([], dtype="int64")})
        srcs = g.loc[g["member"] == -1, ["doc", "val"]].copy()
        mem = g.loc[g["member"] >= 0, ["doc", "pa_", "pb_", "member"]].copy()
        if distinct and len(mem):
            mem = mem.drop_duplicates()
        if not len(mem) or not len(srcs):
            return empty
        # exact integer merge keys (float64 equality breaks above 2^53)
        srcs["doc"] = srcs["doc"].astype("int64")
        mem["doc"] = mem["doc"].astype("int64")
        m = mem.merge(srcs, on="doc")
        if not len(m):
            return empty
        # the union's null padding turns int64 into pandas float64 —
        # restore exact integer keys (ids above 2^53 would corrupt)
        m["pa_"] = m["pa_"].astype("int64")
        m["pb_"] = m["pb_"].astype("int64")
        m["pair_bucket"] = ((m["pa_"] * 1_000_003 + m["pb_"])
                            % num_buckets).astype("int64")
        return m[["pa_", "pb_", "member", "val", "pair_bucket"]]

    def zip_pair(g: pd.DataFrame) -> pd.DataFrame:
        va, vb = f"{val_col}_a", f"{val_col}_b"
        empty = pd.DataFrame({key_a: pd.Series([], dtype="int64"),
                              key_b: pd.Series([], dtype="int64"),
                              va: pd.Series([], dtype="object"),
                              vb: pd.Series([], dtype="object")})
        if not len(g):
            return empty
        a_side = g.loc[g["member"] == 0, ["pa_", "pb_", "val"]] \
            .rename(columns={"val": va})
        b_side = g.loc[g["member"] == 1, ["pa_", "pb_", "val"]] \
            .rename(columns={"val": vb})
        out = a_side.merge(b_side, on=["pa_", "pb_"])
        if not len(out):
            return empty
        return out.rename(columns={"pa_": key_a, "pb_": key_b})

    return (unioned.groupby("bucket")
            .map_groups(gather, batch_format="pandas")
            .groupby("pair_bucket")
            .map_groups(zip_pair, batch_format="pandas"))


# ---------------------------------------------------------------- exact ----

def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """One row per distinct text, keeping the smallest id
    (deterministic winner).  Returns columns (id_col, text_col).

    Partial min per batch (Arrow combiner; nulls form their own group,
    the SQL GROUP BY rule), then the 64-bucket content-hash shuffle
    with a pandas per-bucket min — the shuffle moves int64 buckets,
    never sorts multi-KB text keys, and a NULL text (hashing to the
    fixed null-group key) survives where a text-keyed Ray sort-shuffle
    would crash comparing None to str."""
    from hepcrawl_ray.ops.text import content_hash64

    n_buckets = 64

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(text_col).aggregate([(id_col, "min")])
        g = g.rename_columns([text_col, "_pmin"])
        h = content_hash64(g.column(text_col).to_pylist())
        return g.append_column("_bucket", pa.array(
            (h % n_buckets).astype(np.int64)))

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(text_col, as_index=False, dropna=False)
               ["_pmin"].min().rename(columns={"_pmin": id_col}))
        out[id_col] = out[id_col].astype("int64")
        return out[[id_col, text_col]]

    return (ds.select_columns([id_col, text_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(pick, batch_format="pandas"))


# ---------------------------------------------------------- minhash LSH ----

def make_minhash_stage(num_perm=64, bands=16, k_shingle=3,
                       id_col="doc_id", text_col="text"):
    """Stateless-task UDF: minhash signatures + banded LSH keys per
    doc.  The (a, b) permutation params are deterministic from
    ``num_perm`` and tiny, so they ride the task closure — no actor
    pool to ramp (CLAUDE lesson 15)."""
    a, b = T.minhash_params(num_perm)

    def minhash_bands(batch: pa.Table) -> pa.Table:
        """Fully batch-vectorized: shingle-less docs emit no band rows
        (would otherwise sentinel-collide with every other short doc;
        the exact twin emits no pairs for them either)."""
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        texts = batch.column(text_col).to_numpy(zero_copy_only=False)
        doc_idx, sig = T.minhash_batch(texts, a, b, k_shingle)
        if not len(doc_idx):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "band": pa.array([], pa.int64()),
                             "band_val": pa.array([], pa.int64())})
        vals = T.band_digests(sig, bands)                 # (n, bands)
        n = len(doc_idx)
        return pa.table({
            "doc_id": pa.array(np.repeat(
                ids[doc_idx].astype(np.int64), bands)),
            "band": pa.array(np.tile(
                np.arange(bands, dtype=np.int64), n)),
            "band_val": pa.array(vals.reshape(-1)),
        })

    return minhash_bands


def minhash_lsh_pairs(ds, *, num_perm=64, bands=16, k_shingle=3,
                      threshold=0.5, id_col="doc_id", text_col="text",
                      max_bucket=64, concurrency=4):
    """Candidate pairs from banded MinHash, verified by exact Jaccard.

    Returns (doc_a, doc_b) with doc_a < doc_b and token-shingle
    Jaccard >= threshold.  ``max_bucket`` caps pathological buckets
    (hot-key guard; see module docstring).  Verification joins the
    candidate pairs back against the documents dataset (keyed, no
    corpus broadcast).
    """
    band_rows = ds.select_columns([id_col, text_col]).map_batches(
        make_minhash_stage(num_perm=num_perm, bands=bands,
                           k_shingle=k_shingle, id_col=id_col,
                           text_col=text_col),
        batch_format="pyarrow")

    n_hash_buckets = 64

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = (batch.column("band_val").to_numpy() % n_hash_buckets)
        return batch.append_column("bucket", pa.array(b.astype(np.int64)))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """Candidate pairs within one hash bucket of (band, band_val)
        groups — pandas self-merge, with a per-group size cap
        (hot-key guard).  Dedup here is bucket-local only; the global
        cross-band distinct rides the gather shuffle downstream
        (attach_pair_values(distinct=True))."""
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

    candidates = (band_rows.map_batches(add_bucket, batch_format="pyarrow")
                  .groupby("bucket")
                  .map_groups(bucket_pairs, batch_format="pandas"))

    # keyed join back to the documents dataset — texts move only for
    # candidate pairs; exact Jaccard is then row-local.  Cross-band
    # duplicate candidates are deduped INSIDE the gather (distinct=True)
    # — no dedicated distinct-pairs shuffle.
    withtexts = attach_pair_values(
        candidates, ds.select_columns([id_col, text_col]),
        key_a="doc_a", key_b="doc_b", src_key=id_col, val_col=text_col,
        distinct=True)
    ta, tb = f"{text_col}_a", f"{text_col}_b"

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64"),
                                 "jaccard": pd.Series([], dtype="float64")})
        jac = [T.jaccard_tokens(a, b, k_shingle)
               for a, b in zip(batch[ta], batch[tb])]
        batch = batch.assign(jaccard=jac)
        return batch.loc[batch["jaccard"] >= threshold,
                         ["doc_a", "doc_b", "jaccard"]]

    return withtexts.map_batches(verify, batch_format="pandas")


# -------------------------------------------------------------- simhash ----

def simhash_signatures(ds, id_col="doc_id", text_col="text", concurrency=4):
    """(id, simhash:int64) per document."""
    def sig(batch: pa.Table) -> pa.Table:
        s = T.simhash64(batch.column(text_col).to_pylist())
        return pa.table({id_col: batch.column(id_col),
                         "simhash": pa.array(s, type=pa.int64())})

    return ds.select_columns([id_col, text_col]).map_batches(
        sig, batch_format="pyarrow")


def hamming_neardup_pairs(sigs, *, sig_col="sig", id_col="doc_id",
                          max_distance=3, max_bucket=4096):
    """EXACT Hamming-ball pairs over ANY 64-bit signature column
    (SimHash text signatures, image perceptual hashes, audio
    fingerprints — anything stored as int64).

    Pigeonhole blocking: the 64 bits split into ``max_distance + 1``
    disjoint bands — any pair within Hamming distance d agrees exactly
    on at least one band, so grouping by (band, band_bits) loses NO
    pairs; the full signature rides along and verifies
    ``hamming64 <= d`` inline in the bucket group (same
    carry-payload-through-blocking shape as the embedding-LSH path).
    Result: all (doc_a, doc_b, distance) with distance <= max_distance,
    a < b.

    Exact UP TO the ``max_bucket`` hot-key guard: a (band, band_bits)
    group larger than ``max_bucket`` is dropped whole (e.g. thousands
    of boilerplate docs sharing signature 0 would otherwise force an
    all-pairs blow-up in one group).  A pair blocked ONLY by oversized
    groups is missed — the same documented recall/cost trade as
    ``max_shingle_df`` in the ngram path; raise ``max_bucket`` (or
    pre-dedup exact duplicates) when completeness matters more than
    the quadratic group cost.
    """
    n_bands = max_distance + 1
    # contiguous bit chunks, sizes as even as possible
    base, extra = divmod(64, n_bands)
    widths = [base + (1 if i < extra else 0) for i in range(n_bands)]
    offsets = np.cumsum([0] + widths[:-1])
    signature_col = sig_col  # band_rows has a local list named sig_col

    def band_rows(t: pa.Table) -> pa.Table:
        sig = t.column(signature_col).to_numpy().view(np.uint64)
        ids = t.column(id_col).combine_chunks() if isinstance(
            t.column(id_col), pa.ChunkedArray) else t.column(id_col)
        out_id = pa.concat_arrays([ids] * n_bands)
        band_col, bits_col, sig_col = [], [], []
        for b in range(n_bands):
            mask = np.uint64((1 << widths[b]) - 1)
            bits = (sig >> np.uint64(offsets[b])) & mask
            band_col.append(np.full(len(sig), b, dtype=np.int32))
            bits_col.append(bits.view(np.int64))
            sig_col.append(sig.view(np.int64))
        return pa.table({"doc_id": out_id,
                         "band": np.concatenate(band_col),
                         "band_bits": np.concatenate(bits_col),
                         "sig": np.concatenate(sig_col)})

    def add_bucket(t: pa.Table) -> pa.Table:
        b = (t.column("band_bits").to_numpy() * 31
             + t.column("band").to_numpy()) % 64
        return t.append_column("bucket", pa.array(b.astype(np.int64)))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                              "doc_b": pd.Series([], dtype="int64"),
                              "distance": pd.Series([], dtype="int64"),
                              "pair_bucket": pd.Series([], dtype="int64")})
        sizes = g.groupby(["band", "band_bits"])["doc_id"].transform("size")
        g = g[(sizes >= 2) & (sizes <= max_bucket)]
        if not len(g):
            return empty
        m = g.merge(g, on=["band", "band_bits"])
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        if not len(m):
            return empty
        dist = T.hamming64(m["sig_x"].to_numpy(), m["sig_y"].to_numpy())
        m = m.assign(distance=dist)
        m = m[m["distance"] <= max_distance]
        out = (m[["doc_id_x", "doc_id_y", "distance"]].drop_duplicates()
               .rename(columns={"doc_id_x": "doc_a", "doc_id_y": "doc_b"}))
        out["distance"] = out["distance"].astype("int64")
        out["pair_bucket"] = ((out["doc_a"] * 1_000_003 + out["doc_b"])
                              % 64).astype("int64")
        return out

    def distinct_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g[["doc_a", "doc_b", "distance"]].drop_duplicates()

    return (sigs.map_batches(band_rows, batch_format="pyarrow")
            .map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(bucket_pairs, batch_format="pandas")
            .groupby("pair_bucket")
            .map_groups(distinct_pairs, batch_format="pandas"))


def simhash_neardup_pairs(ds, *, max_distance=3, id_col="doc_id",
                          text_col="text", max_bucket=4096, concurrency=4):
    """EXACT Hamming-ball pairs over 64-bit SimHash text signatures:
    ``simhash_signatures`` then the generic pigeonhole-banded
    ``hamming_neardup_pairs`` (see there for the exactness argument
    and the ``max_bucket`` trade)."""
    sigs = simhash_signatures(ds, id_col=id_col, text_col=text_col,
                              concurrency=concurrency)
    return hamming_neardup_pairs(sigs, sig_col="simhash", id_col=id_col,
                                 max_distance=max_distance,
                                 max_bucket=max_bucket)


# ------------------------------------------------------- n-gram Jaccard ----

def ngram_jaccard_pairs(ds, *, k_shingle=3, threshold=0.5,
                        id_col="doc_id", text_col="text",
                        max_shingle_df=256, concurrency=4,
                        metric="jaccard"):
    """EXACT Jaccard >= threshold pairs via shared-shingle blocking.

    ``metric="containment"`` switches the finalizer to set containment
    (n_common / min(|A|, |B|) — the asymmetric subset-dup signal that
    Jaccard misses when a short doc is wholly contained in a long one);
    ``threshold`` is then an INTEGER milli-score (e.g. 800 = 0.8) and
    the output carries a ``containment_milli`` column, so the SQL twin
    hashes identically (integer division on both sides).

    Identical result to all-pairs Jaccard (any pair with J >= t > 0
    shares >= 1 shingle, so blocking loses nothing); cost is bounded by
    dropping shingles with document frequency > ``max_shingle_df``
    (a pair blocked *only* by ultra-common shingles can be missed —
    the documented recall trade; set it high enough for the corpus).
    SQL-expressible -> has a DuckDB oracle.

    Each exploded (doc, shingle) row carries the doc's total distinct
    shingle count ``nsh``; the merged pair rows therefore already hold
    both denominator terms, so Jaccard = n_common /
    (nsh_a + nsh_b - n_common) finalizes with pure vectorized math —
    no corpus broadcast, no join, no second corpus pass.
    """
    def explode(batch: pa.Table) -> pa.Table:
        # vectorized shingle explosion (T.shingle_explode: Arrow split
        # + one windowed join kernel) + C-level per-doc distinct —
        # replaces the per-doc `set(shingles(t))` Python loop
        di, sh = T.shingle_explode(batch.column(text_col), k_shingle)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)[di]
        df = pd.DataFrame({"doc_id": ids,
                           "shingle": sh.to_numpy(zero_copy_only=False)
                           }).drop_duplicates()
        nsh = df.groupby("doc_id")["shingle"].transform("size")
        return pa.table({"doc_id": pa.array(df["doc_id"].to_numpy(),
                                            pa.int64()),
                         "shingle": pa.array(df["shingle"], pa.string()),
                         "nsh": pa.array(nsh.to_numpy(), pa.int64())})

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
                                 "pn": pd.Series([], dtype="int64"),
                                 "nsh_a": pd.Series([], dtype="int64"),
                                 "nsh_b": pd.Series([], dtype="int64"),
                                 "pair_bucket": pd.Series([], dtype="int64")})
        m = g.merge(g, on="shingle")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        out = (m.groupby(["doc_id_x", "doc_id_y"], as_index=False)
               .agg(pn=("shingle", "size"), nsh_a=("nsh_x", "first"),
                    nsh_b=("nsh_y", "first")))
        out.rename(columns={"doc_id_x": "doc_a", "doc_id_y": "doc_b"},
                   inplace=True)
        # re-bucket by PAIR for the cross-bucket count merge (Ray's
        # grouped aggregate over millions of distinct keys is ~100x
        # slower than 64 pandas group-sums)
        out["pair_bucket"] = ((out["doc_a"] * 1_000_003 + out["doc_b"])
                              % n_buckets).astype("int64")
        return out

    def sum_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """Merge per-bucket partial counts into the global common-
        shingle count, then finalize Jaccard right here (nsh_a/nsh_b
        ride along, constant per pair)."""
        out = (g.groupby(["doc_a", "doc_b"], as_index=False)
               .agg(n=("pn", "sum"), nsh_a=("nsh_a", "first"),
                    nsh_b=("nsh_b", "first")))
        if metric == "containment":
            n_i = out["n"].to_numpy(dtype=np.int64)
            mn = np.minimum(out["nsh_a"].to_numpy(dtype=np.int64),
                            out["nsh_b"].to_numpy(dtype=np.int64))
            milli = (1000 * n_i) // np.maximum(mn, 1)
            out["containment_milli"] = milli.astype(np.int64)
            keep = (mn > 0) & (milli >= int(threshold))
            return out.loc[keep,
                           ["doc_a", "doc_b", "containment_milli"]]
        n = out["n"].to_numpy(dtype=np.float64)
        den = (out["nsh_a"].to_numpy() + out["nsh_b"].to_numpy()
               - n).astype(np.float64)
        keep = (den > 0) & (n / np.where(den > 0, den, 1.0) >= threshold)
        return out.loc[keep, ["doc_a", "doc_b"]]

    exploded = ds.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow").map_batches(
        add_bucket, batch_format="pyarrow")
    return (exploded.groupby("bucket")
            .map_groups(pairs_in_bucket, batch_format="pandas")
            .groupby("pair_bucket")
            .map_groups(sum_pairs, batch_format="pandas"))


def neardup_components(ds, pairs_ds, *, id_col="doc_id",
                       pair_a="doc_a", pair_b="doc_b", carry_cols=()):
    """Connected components over a near-dup pair table: every doc gets
    its component root (min id); docs in no pair are their own root.

    Pairs alone don't deduplicate — transitive chains (A~B, B~C) must
    collapse to ONE representative.  The pair table is candidate-sized
    (|near-dup pairs| << |corpus|), so union-find runs on the driver
    over PAIRS ONLY and the resulting node->root map (nodes touched by
    pairs only) broadcasts for a vectorized corpus map — the corpus
    itself never leaves the workers.  If pair volume ever outgrew the
    driver, the same contract is served by iterative bucketed
    min-label propagation (O(diameter) keyed shuffles).

    ``carry_cols`` names payload columns of ``ds`` (e.g. a length /
    quality score) to pass through unchanged next to the root label,
    so downstream selection policies need no second corpus join.
    """
    import ray

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:        # path compression
            parent[x], x = root, parent[x]
        return root

    for batch in pairs_ds.iter_batches(batch_size=65536,
                                       batch_format="pyarrow"):
        for a, b in zip(batch.column(pair_a).to_pylist(),
                        batch.column(pair_b).to_pylist()):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                if rb < ra:                  # min id wins as root
                    ra, rb = rb, ra
                parent[rb] = ra
    comp = {x: find(x) for x in list(parent)}
    comp_ref = ray.put(comp)

    class MapRoot:
        def __init__(self):
            self.comp = ray.get(comp_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t.column(id_col).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            # dict-map in pandas C (ids outside the pair table keep
            # themselves as root) — no per-row Python lookup
            s = pd.Series(ids)
            roots = s.map(self.comp).fillna(s).astype("int64")
            cols = {id_col: t.column(id_col),
                    "root": pa.array(roots.to_numpy(), pa.int64())}
            for c in carry_cols:
                cols[c] = t.column(c)
            return pa.table(cols)

    return ds.select_columns([id_col, *carry_cols]).map_batches(
        MapRoot, batch_format="pyarrow", concurrency=(1, 2), num_cpus=0.5)


def canonical_per_component(comp_ds, *, score_col, id_col="doc_id",
                            root_col="root", n_buckets=64):
    """Representative selection — the dedup DECISION step: within each
    near-dup component keep exactly one document (highest ``score_col``,
    ties broken by min ``id_col``), flag the rest as drops.

    Component ids are high-cardinality (≈ one per unique doc), so the
    per-root argmax runs as a hash-bucket shuffle with a pandas-in-C
    group body (CLAUDE lesson 1) — one keyed exchange of (id, root,
    score) rows only; no payload, no driver materialization.
    """
    def prep(t: pa.Table) -> pa.Table:
        r = t.column(root_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return t.append_column(
            "_bucket", pa.array((r % n_buckets).astype(np.int64)))

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_bucket"])
        # lesson 13: re-pin key dtypes after the shuffle
        g[id_col] = g[id_col].astype("int64")
        g[root_col] = g[root_col].astype("int64")
        srt = g.sort_values([root_col, score_col, id_col],
                            ascending=[True, False, True],
                            kind="mergesort")
        keep_ids = set(srt.drop_duplicates(root_col)[id_col].to_numpy())
        g["keep"] = g[id_col].isin(keep_ids).astype("int64")
        return g

    return (comp_ds.map_batches(prep, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(pick, batch_format="pandas"))


# ---------------------------------------------------- embedding cosine ----

def embedding_neardup_pairs(ds, *, threshold=0.95, id_col="vec_id",
                            vec_col="embedding", max_ids=None,
                            concurrency=4, max_block_pairs=2048):
    """EXACT near-duplicate pairs by cosine similarity, as a block-pair
    cross product over object-store blocks.

    Exact all-pairs cosine is inherently quadratic; the scale-correct
    shape is the block decomposition: normalize each (id, vec) block
    once, pin the blocks in the OBJECT STORE, then fan out one task
    per unordered block pair (i <= j) that pulls just its two blocks
    (zero-copy Arrow) and emits thresholded pairs from one matmul.
    Nothing ever materializes on the driver and no worker holds more
    than two blocks — vs the former ``take_all()`` + broadcast-matrix
    baseline, which OOMs for any corpus that outgrows one heap.

    ``max_block_pairs`` caps the task count (B blocks -> B(B+1)/2
    tasks): the corpus is repartitioned down when it would exceed the
    cap, trading per-task memory for task count.  At true 100-TB scale
    exact all-pairs is the wrong tool no matter the decomposition —
    ``embedding_lsh_neardup_pairs`` is the linear-cost path — but when
    EXACT is required this is its distributable form.
    """
    import ray

    src = ds.select_columns([id_col, vec_col])
    if max_ids is not None:
        src = src.map_batches(
            lambda t: t.filter(pa.compute.less(t.column(id_col), max_ids)),
            batch_format="pyarrow")

    def prenormalize(t: pa.Table) -> pa.Table:
        from hepcrawl_ray.ops.knn import (drop_null_vectors,
                                          list_column_to_matrix)

        t = drop_null_vectors(t, vec_col)
        if t.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "vec_bin": pa.array([], pa.binary())})
        v = list_column_to_matrix(t.column(vec_col)).astype(np.float64)
        n = np.linalg.norm(v, axis=1)
        n[n == 0] = 1.0
        v = v / n[:, None]
        return pa.table({"vec_id": t.column(id_col).cast(pa.int64()),
                         "vec_bin": pa.array([r.tobytes() for r in v],
                                             pa.binary())})

    # normalize once per row, then pin blocks in the object store; cap
    # the block count so the pair fan-out stays bounded
    mat = src.map_batches(prenormalize, batch_format="pyarrow").materialize()
    max_blocks = max(1, int((2 * max_block_pairs) ** 0.5))
    if mat.num_blocks() > max_blocks:
        mat = mat.repartition(max_blocks).materialize()
    refs = [r for r in mat.to_arrow_refs()]

    pair_idx = [(i, j) for i in range(len(refs))
                for j in range(i, len(refs))]
    pair_ds = ray.data.from_items(
        [{"i": i, "j": j} for i, j in pair_idx])

    def _unpack(t: pa.Table):
        # emptiness FIRST: materialize/repartition can emit SCHEMA-LESS
        # empty blocks (lesson-11 family) where column("vec_id") raises
        if t.num_rows == 0 or t.schema.get_field_index("vec_id") < 0:
            return np.array([], np.int64), np.zeros((0, 0))
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        m = np.stack([np.frombuffer(b)
                      for b in t.column("vec_bin").to_pylist()])
        return ids, m

    def block_pair(batch: pa.Table) -> pa.Table:
        """Compare two pinned blocks per row; the closure carries only
        the tiny ref list (stateless task — lesson 15), blocks come
        zero-copy from the object store."""
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for i, j in zip(batch.column("i").to_pylist(),
                        batch.column("j").to_pylist()):
            ids_i, m_i = _unpack(ray.get(refs[i]))
            ids_j, m_j = _unpack(ray.get(refs[j]))
            if not len(ids_i) or not len(ids_j):
                continue
            r, c = np.nonzero(m_i @ m_j.T >= threshold)
            a, b = ids_i[r], ids_j[c]
            if i == j:
                # symmetric matrix: (r,c) and (c,r) both fire —
                # a<b keeps exactly one and drops self-pairs
                keep = a < b
                out_a.append(a[keep])
                out_b.append(b[keep])
            else:
                lo, hi = np.minimum(a, b), np.maximum(a, b)
                out_a.append(lo)
                out_b.append(hi)
        a = np.concatenate(out_a) if out_a else np.array([], np.int64)
        b = np.concatenate(out_b) if out_b else np.array([], np.int64)
        return pa.table({"vec_a": pa.array(a, type=pa.int64()),
                         "vec_b": pa.array(b, type=pa.int64())})

    return pair_ds.map_batches(block_pair, batch_format="pyarrow",
                               batch_size=4)


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

    Verification is INLINE in the bucket group: each bucket row
    carries its (raw float32, packed) vector through the ONE keyed
    shuffle, so exact cosine runs vectorized where the candidates are
    formed and only verified pairs leave the group.  Shuffle volume is
    N x n_tables x (vec_bytes + 8 x n_tables) — linear in corpus size —
    vs shipping vectors per candidate PAIR, which is quadratic in
    bucket occupancy.  The only broadcast state is the
    (n_tables x n_planes x dim) plane tensor; no corpus ever sits on
    the driver or in one worker.

    Cross-table pair dedup needs NO second shuffle: every row carries
    all ``n_tables`` keys of its vector (8 x n_tables bytes), so each
    candidate pair is emitted only by its FIRST-collision table —
    locally decidable, globally distinct.  (A pair whose
    first-collision group overflows ``max_bucket`` is dropped — the
    same candidate-loss mode as the oversize drop itself.)
    """
    # Deterministic projection planes: derived from (seed, n_tables,
    # n_planes, dim) alone, so every task regenerates IDENTICAL planes
    # from the batch's own dim — no up-front take(1) pipeline, no
    # broadcast object, and the stage stays a stateless TASK (a 32 KB
    # plane tensor doesn't justify an actor pool; see CLAUDE lesson 15).
    _plane_cache: dict = {}

    def _planes_for(dim: int) -> np.ndarray:
        p = _plane_cache.get(dim)
        if p is None:
            rng = np.random.default_rng(seed)
            p = rng.standard_normal((n_tables, n_planes, dim))
            _plane_cache[dim] = p
        return p

    def bucket_keys(t: pa.Table) -> pa.Table:
        """One row per (vector, table): LSH key, the raw float32
        vector packed to fixed-size binary (one buffer, no per-row
        tobytes loop), and the row's FULL key set for the
        first-collision ownership check downstream."""
        from hepcrawl_ray.ops.knn import (drop_null_vectors,
                                          list_column_to_matrix)

        t = drop_null_vectors(t, vec_col)
        if t.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "table": pa.array([], pa.int32()),
                             "key": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64()),
                             "vec_bin": pa.array([], pa.binary()),
                             "keys_bin": pa.array([], pa.binary())})
        v32 = list_column_to_matrix(t.column(vec_col)).astype(
            np.float32, copy=False)
        n_rows, dim = v32.shape
        planes = _planes_for(dim)
        # sign(v . p) is scale-invariant: no normalization needed for
        # keys; one flat (dim, tables*planes) matmul computes them all
        signs = (v32 @ planes.reshape(n_tables * n_planes, dim)
                 .T.astype(np.float32)) > 0          # (n, tab*planes)
        signs = signs.reshape(n_rows, n_tables, n_planes)
        keys16 = (signs * (1 << np.arange(n_planes))).sum(
            axis=2).astype(np.int64)                 # (n, tables)
        # vectorized packing: whole matrices become ONE buffer each
        vec_fsb = pa.Array.from_buffers(
            pa.binary(dim * 4), n_rows,
            [None, pa.py_buffer(np.ascontiguousarray(v32).tobytes())])
        keys_fsb = pa.Array.from_buffers(
            pa.binary(n_tables * 8), n_rows,
            [None, pa.py_buffer(np.ascontiguousarray(keys16).tobytes())])
        ids = t.column(id_col).cast(pa.int64()).combine_chunks()
        tab_idx = np.repeat(np.arange(n_tables, dtype=np.int32), n_rows)
        keys_flat = keys16.ravel(order="F")          # table-major
        bucket = (keys_flat * 31 + tab_idx) % 64
        return pa.table({
            "vec_id": pa.chunked_array([ids] * n_tables),
            "table": pa.array(tab_idx),
            "key": pa.array(keys_flat),
            "bucket": pa.array(bucket.astype(np.int64)),
            "vec_bin": pa.chunked_array([vec_fsb] * n_tables),
            "keys_bin": pa.chunked_array([keys_fsb] * n_tables)})

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """Candidates, first-collision ownership, and exact-cosine
        verification within one hash bucket of (table, key) groups —
        only verified, globally-unique pairs exit."""
        empty = pd.DataFrame({"vec_a": pd.Series([], dtype="int64"),
                              "vec_b": pd.Series([], dtype="int64")})
        sizes = g.groupby(["table", "key"])["vec_id"].transform("size")
        g = g[(sizes >= 2) & (sizes <= max_bucket)]
        if not len(g):
            return empty
        g = g.reset_index(drop=True)
        m = g.reset_index().merge(
            g.reset_index(), on=["table", "key"],
            suffixes=("_x", "_y"))[
            ["index_x", "index_y", "vec_id_x", "vec_id_y", "table"]]
        m = m[m["vec_id_x"] < m["vec_id_y"]]
        if not len(m):
            return empty
        # first-collision ownership: this (table, key) group emits the
        # pair only if NO earlier table also collided — each pair then
        # exits exactly one group across the whole corpus, so no
        # second distinct shuffle is ever needed
        keys = np.frombuffer(b"".join(g["keys_bin"]),
                             dtype=np.int64).reshape(len(g), -1)
        ix = m["index_x"].to_numpy()
        iy = m["index_y"].to_numpy()
        first_tab = (keys[ix] == keys[iy]).argmax(axis=1)
        m = m[first_tab == m["table"].to_numpy()]
        if not len(m):
            return empty
        # verify with the exact twin's numerics: float32 payload,
        # float64 norm + dot (embedding_neardup_pairs does the same)
        mat = np.frombuffer(b"".join(g["vec_bin"]),
                            dtype=np.float32).reshape(len(g), -1) \
            .astype(np.float64)
        nrm = np.linalg.norm(mat, axis=1)
        nrm[nrm == 0] = 1.0
        mat /= nrm[:, None]
        cos = np.einsum("ij,ij->i", mat[m["index_x"].to_numpy()],
                        mat[m["index_y"].to_numpy()])
        m = m[cos >= threshold]
        return (m[["vec_id_x", "vec_id_y"]]
                .rename(columns={"vec_id_x": "vec_a",
                                 "vec_id_y": "vec_b"}))

    return (ds.select_columns([id_col, vec_col])
            .map_batches(bucket_keys, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(bucket_pairs, batch_format="pandas"))


def components_labels(pairs_ds, *, pair_a="doc_a", pair_b="doc_b",
                      n_buckets=32, max_rounds=64):
    """Connected-component labels over a pair table with NO driver
    graph state: iterative bucketed min-label propagation.

    This is the scale path `neardup_components` documents for when the
    pair table outgrows the driver's union-find.  State between rounds
    is a distributed (node, label) Dataset (node-count-sized, lives in
    the object store); each round is two keyed shuffles —
    (1) edges keyed by src pick up src's current label and emit
    (dst, candidate) rows, (2) candidates + current labels keyed by
    node take the per-node min — and the loop stops when a round
    lowers no label (a driver-side scalar per round, never rows).
    Converges in O(component diameter) rounds; diameter of near-dup
    clusters is small in practice (they are dense similarity cliques).

    Returns a Dataset of (node, label) for every node that appears in
    a pair, label = min node id of its component.
    """
    import ray

    def sym_edges(t: pa.Table) -> pa.Table:
        a = t.column(pair_a).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column(pair_b).to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        return pa.table({
            "node": pa.array(src),
            "dst": pa.array(dst),
            "label": pa.nulls(len(src), pa.int64()),
            "_side": pa.array(np.zeros(len(src), np.int8)),
            "_bucket": pa.array((src % n_buckets).astype(np.int64))})

    edges = pairs_ds.map_batches(sym_edges,
                                 batch_format="pyarrow").materialize()

    def init_labels(g: pd.DataFrame) -> pd.DataFrame:
        nodes = pd.unique(g["node"].astype("int64"))
        return pd.DataFrame({"node": nodes,
                             "label": nodes,
                             "changed": np.int64(0)})

    labels = (edges.groupby("_bucket")
              .map_groups(init_labels, batch_format="pandas")
              .materialize())

    def label_side(t) -> pa.Table:
        if isinstance(t, pd.DataFrame):
            t = pa.Table.from_pandas(t, preserve_index=False)
        node = t.column("node").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "node": pa.array(node),
            "dst": pa.nulls(t.num_rows, pa.int64()),
            "label": t.column("label").cast(pa.int64()),
            "_side": pa.array(np.ones(t.num_rows, np.int8)),
            "_bucket": pa.array((node % n_buckets).astype(np.int64))})

    def propagate(g: pd.DataFrame) -> pd.DataFrame:
        """Edges of this src bucket pick up src labels; emit candidate
        rows keyed by dst, plus the labels themselves keyed by node."""
        lab = g[g["_side"] == 1][["node", "label"]]
        lab = lab.astype({"node": "int64", "label": "int64"})
        ed = g[g["_side"] == 0][["node", "dst"]].astype(
            {"node": "int64", "dst": "int64"})
        m = ed.merge(lab, on="node", how="left")
        cand = pd.DataFrame({
            "node": m["dst"].to_numpy(dtype=np.int64),
            "label": m["label"].to_numpy(dtype=np.int64),
            "is_self": np.zeros(len(m), np.int64)})
        own = pd.DataFrame({
            "node": lab["node"].to_numpy(dtype=np.int64),
            "label": lab["label"].to_numpy(dtype=np.int64),
            "is_self": np.ones(len(lab), np.int64)})
        out = pd.concat([cand, own], ignore_index=True)
        out["_bucket2"] = (out["node"] % n_buckets).astype("int64")
        return out

    def take_min(g: pd.DataFrame) -> pd.DataFrame:
        g = g.astype({"node": "int64", "label": "int64",
                      "is_self": "int64"})
        new = g.groupby("node", as_index=False)["label"].min()
        old = (g[g["is_self"] == 1]
               .groupby("node", as_index=False)["label"].min()
               .rename(columns={"label": "old"}))
        new = new.merge(old, on="node", how="left")
        changed = (new["label"] <
                   new["old"].fillna(np.iinfo(np.int64).max))
        return pd.DataFrame({"node": new["node"].astype("int64"),
                             "label": new["label"].astype("int64"),
                             "changed": changed.astype("int64")})

    for _ in range(max_rounds):
        lab_keyed = labels.map_batches(label_side,
                                       batch_format="pandas")
        # repartition: shuffle output block count tracks input block
        # count, so iterated label state would double its blocks every
        # round (superlinear per-block fixed cost) without a coalesce
        labels = (edges.union(lab_keyed)
                  .groupby("_bucket")
                  .map_groups(propagate, batch_format="pandas")
                  .groupby("_bucket2")
                  .map_groups(take_min, batch_format="pandas")
                  .repartition(n_buckets)
                  .materialize())
        if int(labels.sum("changed") or 0) == 0:
            break
    return labels.drop_columns(["changed"])


def neardup_components_distributed(ds, pairs_ds, *, id_col="doc_id",
                                   pair_a="doc_a", pair_b="doc_b",
                                   carry_cols=(), n_buckets=32):
    """`neardup_components` contract served end-to-end distributed:
    labels from min-label propagation (no driver union-find), corpus
    rows labeled via ONE keyed bucket merge (no broadcast map).  Docs
    in no pair keep themselves as root."""
    labels = components_labels(pairs_ds, pair_a=pair_a, pair_b=pair_b,
                               n_buckets=n_buckets)
    schema = ds.schema()
    carry_types = {n: t for n, t in zip(schema.names, schema.types)
                   if n in carry_cols}

    def lab_rows(t: pa.Table) -> pa.Table:
        node = t.column("node").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cols = {id_col: pa.array(node),
                "root": t.column("label").cast(pa.int64()),
                "_side": pa.array(np.ones(t.num_rows, np.int8)),
                "_bucket": pa.array((node % n_buckets).astype(np.int64))}
        for c in carry_cols:
            cols[c] = pa.nulls(t.num_rows, carry_types[c])
        return pa.table(dict(
            (k, cols[k]) for k in
            [id_col, "root", "_side", "_bucket", *carry_cols]))

    def corpus_rows(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cols = {id_col: t.column(id_col),
                "root": pa.nulls(t.num_rows, pa.int64()),
                "_side": pa.array(np.zeros(t.num_rows, np.int8)),
                "_bucket": pa.array((ids % n_buckets).astype(np.int64))}
        for c in carry_cols:
            cols[c] = t.column(c)
        return pa.table(dict(
            (k, cols[k]) for k in
            [id_col, "root", "_side", "_bucket", *carry_cols]))

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        lab = (g[g["_side"] == 1][[id_col, "root"]]
               .astype({id_col: "int64", "root": "int64"})
               .drop_duplicates(id_col))
        rows = g[g["_side"] == 0].drop(columns=["root", "_side",
                                                "_bucket"])
        rows = rows.astype({id_col: "int64"})
        m = rows.merge(lab, on=id_col, how="left")
        m["root"] = m["root"].fillna(m[id_col]).astype("int64")
        return m[[id_col, "root", *carry_cols]]

    return (ds.select_columns([id_col, *carry_cols])
            .map_batches(corpus_rows, batch_format="pyarrow")
            .union(labels.map_batches(lab_rows,
                                      batch_format="pyarrow"))
            .groupby("_bucket")
            .map_groups(resolve, batch_format="pandas"))


# ----------------------------------------------- incremental LSH index ----

def build_minhash_band_index(ds, index_dir: str, *, num_perm=64,
                             bands=16, k_shingle=3, id_col="doc_id",
                             text_col="text",
                             num_buckets: int = 256) -> dict:
    """Materialize the corpus's banded-MinHash keys to parquet
    PARTITIONED BY band-val bucket — the incremental-dedup scale path.

    A production corpus dedups ONCE, then absorbs daily deltas; this
    index makes the delta run read only the band buckets the NEW
    batch's own signatures hash to (partition pruning, same shape as
    ops/knn.py:build_ivf_index) instead of recomputing LSH over the
    full corpus.  ``num_buckets`` here is the INDEX partition count
    (default 256): a small delta touches a small subset.
    """
    import json
    import os

    stage = make_minhash_stage(num_perm=num_perm, bands=bands,
                               k_shingle=k_shingle, id_col=id_col,
                               text_col=text_col)

    def add_bucket(t: pa.Table) -> pa.Table:
        b = (t.column("band_val").to_numpy() % num_buckets)
        return t.append_column("bucket",
                               pa.array(b.astype(np.int64)))

    os.makedirs(index_dir, exist_ok=True)
    (ds.select_columns([id_col, text_col])
     .map_batches(stage, batch_format="pyarrow")
     .map_batches(add_bucket, batch_format="pyarrow")
     .write_parquet(index_dir, partition_cols=["bucket"]))
    meta = {"num_perm": num_perm, "bands": bands,
            "k_shingle": k_shingle, "num_buckets": num_buckets}
    with open(os.path.join(index_dir, "band_index_meta.json"),
              "w") as f:
        json.dump(meta, f)
    return meta


def incremental_neardup_pairs(index_dir: str, new_ds, corpus_ds, *,
                              threshold=0.5, id_col="doc_id",
                              text_col="text", max_bucket=64):
    """Near-dup pairs INVOLVING the new batch — new-vs-corpus and
    new-vs-new — against a ``build_minhash_band_index`` layout,
    reading only the probed index partitions.

    Same hash family and params as the index (from its meta file), so
    the candidate set is EXACTLY the full-LSH run's candidates
    restricted to pairs touching the new batch (pinned in
    tests/test_incremental_dedup.py).  Verification gathers texts only
    for candidate pairs from corpus+new (attach_pair_values — never a
    corpus broadcast).  Returns (doc_a, doc_b, jaccard, n_buckets_read,
    n_buckets_total) as (Dataset, int, int).
    """
    import glob
    import json
    import os

    import ray

    with open(os.path.join(index_dir, "band_index_meta.json")) as f:
        meta = json.load(f)
    nb = meta["num_buckets"]
    stage = make_minhash_stage(num_perm=meta["num_perm"],
                               bands=meta["bands"],
                               k_shingle=meta["k_shingle"],
                               id_col=id_col, text_col=text_col)

    def add_bucket_side(side):
        def f(t: pa.Table) -> pa.Table:
            b = (t.column("band_val").to_numpy() % nb)
            return pa.table({
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "band": t.column("band").cast(pa.int64()),
                "band_val": t.column("band_val").cast(pa.int64()),
                "bucket": pa.array(b.astype(np.int64)),
                "side": pa.array(
                    np.full(t.num_rows, side, np.int8))})
        return f

    new_bands = (new_ds.select_columns([id_col, text_col])
                 .map_batches(stage, batch_format="pyarrow")
                 .map_batches(add_bucket_side(1),
                              batch_format="pyarrow")
                 .materialize())

    # probe set: buckets the new batch's signatures actually hash to
    def buckets_only(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({"bucket": pc.unique(t.column("bucket"))})

    touched = set()
    for bt in new_bands.map_batches(
            buckets_only, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        touched.update(bt.column("bucket").to_pylist())
    part_dirs = sorted(glob.glob(os.path.join(index_dir, "bucket=*")))
    picked = [d for d in part_dirs
              if int(os.path.basename(d).split("=")[1]) in touched]
    files = []
    for d in picked:
        files.extend(sorted(glob.glob(os.path.join(d, "*.parquet"))))

    def tag_old(t: pa.Table) -> pa.Table:
        b = (t.column("band_val").to_numpy() % nb)
        return pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "band": t.column("band").cast(pa.int64()),
            "band_val": t.column("band_val").cast(pa.int64()),
            "bucket": pa.array(b.astype(np.int64)),
            "side": pa.array(np.zeros(t.num_rows, np.int8))})

    sides = new_bands
    if files:
        sides = sides.union(ray.data.read_parquet(files).map_batches(
            tag_old, batch_format="pyarrow"))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                              "doc_b": pd.Series([], dtype="int64")})
        sizes = g.groupby(["band", "band_val"])["doc_id"] \
            .transform("size")
        g = g[(sizes >= 2) & (sizes <= max_bucket)]
        if not len(g):
            return empty
        m = g.merge(g, on=["band", "band_val"])
        m = m[(m["doc_id_x"] < m["doc_id_y"])
              & ((m["side_x"] == 1) | (m["side_y"] == 1))]
        out = m[["doc_id_x", "doc_id_y"]].drop_duplicates()
        out.columns = ["doc_a", "doc_b"]
        return out.astype("int64")

    candidates = sides.groupby("bucket").map_groups(
        bucket_pairs, batch_format="pandas")

    def as_arrow(t: pa.Table) -> pa.Table:
        # attach_pair_values reads the src schema for null-typing;
        # pandas-block inputs would hand it a numpy dtype
        return pa.table({id_col: t.column(id_col).cast(pa.int64()),
                         text_col: t.column(text_col)
                         .cast(pa.string())})

    texts = (corpus_ds.select_columns([id_col, text_col])
             .union(new_ds.select_columns([id_col, text_col]))
             .map_batches(as_arrow, batch_format="pyarrow"))
    withtexts = attach_pair_values(
        candidates, texts, key_a="doc_a", key_b="doc_b",
        src_key=id_col, val_col=text_col, distinct=True)
    ta, tb = f"{text_col}_a", f"{text_col}_b"

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame(
                {"doc_a": pd.Series([], dtype="int64"),
                 "doc_b": pd.Series([], dtype="int64"),
                 "jaccard": pd.Series([], dtype="float64")})
        jac = [T.jaccard_tokens(a, b, meta["k_shingle"])
               for a, b in zip(batch[ta], batch[tb])]
        batch = batch.assign(jaccard=jac)
        return batch.loc[batch["jaccard"] >= threshold,
                         ["doc_a", "doc_b", "jaccard"]]

    return (withtexts.map_batches(verify, batch_format="pandas"),
            len(picked), len(part_dirs))
