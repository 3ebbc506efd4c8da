"""Text analysis kernels: tokens, quality, language-ID, fingerprints,
minhash/simhash signatures.

All kernels are batch-oriented (operate on a list/array of documents
and return numpy arrays / python lists ready for Arrow), designed as
``map_batches`` bodies.  Definitions that have a SQL oracle use
*whitespace tokenization* (``\\s+`` split of the trimmed text) so DuckDB
can replicate them exactly.
"""

from __future__ import annotations

import re
from hashlib import blake2b

import numpy as np

# RE2's \s class ([\t\n\f\r ] — ASCII, no \v, no Unicode spaces), NOT
# Python's Unicode \s: the vectorized kernels (Arrow
# split_pattern_regex) and every DuckDB oracle (regexp_split_to_array)
# run RE2, so the scalar reference MUST tokenize identically or
# non-ASCII whitespace silently diverges engine-vs-oracle (r5 review).
_WS = re.compile(r"[\t\n\f\r ]+")

# small fixed stopword list — shared with the SQL oracle
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for")

# per-language marker words for the n-gram/stopword language heuristic
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "a", "in", "is"},
    "de": {"der", "die", "das", "und", "ist", "nicht"},
    "es": {"el", "la", "los", "que", "y", "es"},
    "fr": {"le", "la", "les", "et", "est", "une"},
}


def tokenize_ws(text: str | None) -> list[str]:
    """Whitespace tokens of the trimmed text (SQL-replicable).  A NULL
    text yields no tokens — matching SQL, where
    ``unnest(regexp_split_to_array(NULL, ...))`` produces zero rows."""
    if text is None:
        return []
    text = text.strip()
    return _WS.split(text) if text else []


def token_stats(texts) -> dict[str, np.ndarray]:
    """(n_tokens, chars_no_ws, n_stopwords, has_digits) per text —
    integer-valued so the DuckDB oracle hashes identically."""
    n = len(texts)
    n_tokens = np.zeros(n, dtype=np.int64)
    chars_no_ws = np.zeros(n, dtype=np.int64)
    n_stop = np.zeros(n, dtype=np.int64)
    has_digits = np.zeros(n, dtype=bool)
    stop = set(STOPWORDS)
    for i, t in enumerate(texts):
        toks = tokenize_ws(t)
        n_tokens[i] = len(toks)
        chars_no_ws[i] = sum(len(tok) for tok in toks)
        n_stop[i] = sum(1 for tok in toks if tok.lower() in stop)
        has_digits[i] = any(ch.isdigit() for ch in t)
    return {"n_tokens": n_tokens, "chars_no_ws": chars_no_ws,
            "n_stopwords": n_stop, "has_digits": has_digits}


def token_stats_arrow(col) -> dict[str, np.ndarray]:
    """Vectorized ``token_stats`` over an Arrow string column — every
    kernel is pyarrow.compute (RE2), which is also what DuckDB runs,
    so the regex dialect matches the oracle by construction (Python
    ``re``'s Unicode ``\\s`` is wider than RE2's ASCII ``\\s``).

    NULL texts: every metric is computed as 0/false and the rows are
    flagged in the extra ``null_mask`` key (np.bool_), so callers can
    either drop them (SQL filter semantics — a NULL predicate drops
    the row) or surface SQL's NULL stats via ``pa.array(v, mask=...)``.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    null_mask = pc.is_null(col).to_numpy(zero_copy_only=False)
    if null_mask.any():
        col = pc.fill_null(col, "")
    trimmed = pc.utf8_trim_whitespace(col)
    empty = pc.equal(pc.utf8_length(trimmed), 0).to_numpy(
        zero_copy_only=False)
    toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
    n_tokens = pc.list_value_length(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    n_tokens[empty] = 0  # trim('') splits to [''] — SQL counts 0
    no_ws = pc.replace_substring_regex(col, pattern=r"\s", replacement="")
    chars_no_ws = pc.utf8_length(no_ws).to_numpy(
        zero_copy_only=False).astype(np.int64)
    # per-row stopword counts: flatten the token lists, mark stopword
    # hits, bincount by parent row
    flat = pc.utf8_lower(toks.flatten())
    hit = pc.is_in(flat, value_set=pa.array(STOPWORDS)).to_numpy(
        zero_copy_only=False)
    parents = toks.value_parent_indices().to_numpy(zero_copy_only=False)
    n_stop = np.bincount(parents[hit], minlength=len(col)).astype(np.int64)
    n_stop[empty] = 0
    has_digits = pc.match_substring_regex(col, "[0-9]").to_numpy(
        zero_copy_only=False)
    if null_mask.any():
        n_tokens[null_mask] = 0
        chars_no_ws[null_mask] = 0
        n_stop[null_mask] = 0
        has_digits[null_mask] = False
    return {"n_tokens": n_tokens, "chars_no_ws": chars_no_ws,
            "n_stopwords": n_stop, "has_digits": has_digits,
            "null_mask": null_mask}


def langid(texts) -> list[str]:
    """Marker-word language heuristic; 'und' when nothing matches.
    Ties keep the first language in _LANG_MARKERS order (same rule as
    the original per-row loop)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    n = len(texts)
    if n == 0:
        return []
    col = pa.array(list(texts), pa.string())
    toks = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(col), pattern=r"\s+")
    flat = pc.utf8_lower(toks.flatten())
    parents = toks.value_parent_indices().to_numpy(zero_copy_only=False)
    langs = list(_LANG_MARKERS)
    scores = np.zeros((len(langs), n), dtype=np.int64)
    for li, lang in enumerate(langs):
        hit = pc.is_in(flat, value_set=pa.array(
            sorted(_LANG_MARKERS[lang]))).to_numpy(zero_copy_only=False)
        # DISTINCT marker hits per doc (the original used a token SET):
        # count each (doc, marker) once via unique pair encoding
        if hit.any():
            idx = pc.fill_null(pc.index_in(flat, value_set=pa.array(
                sorted(_LANG_MARKERS[lang]))), -1).to_numpy(
                zero_copy_only=False).astype(np.int64)
            # pair-encoding multiplier derives from the marker-set size
            # (a fixed 16 would silently corrupt scores if a language
            # ever grew past 16 markers)
            mult = max(len(_LANG_MARKERS[lang]), 1)
            pairs = parents[hit].astype(np.int64) * mult + idx[hit]
            uniq = np.unique(pairs)
            scores[li] = np.bincount(uniq // mult, minlength=n)
    best = np.argmax(scores, axis=0)          # first max wins ties
    out = [langs[b] if scores[b, i] > 0 else "und"
           for i, b in enumerate(best)]
    return out


# GPT-2-style pre-tokenizer, simplified to RE2 (no lookahead, ASCII
# classes): word runs, digit runs, punctuation runs — each with an
# optional leading space — then residual whitespace.  RE2 is also
# DuckDB's engine, so a SQL oracle counts identically.
BPE_SPLIT_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def bpe_token_count(col) -> np.ndarray:
    """Per-row count of BPE-style pre-tokens (int64) — the token-count
    estimate an LLM data pipeline budgets corpus size with."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return pc.fill_null(pc.count_substring_regex(
        col, pattern=BPE_SPLIT_PATTERN), 0).to_numpy(
        zero_copy_only=False).astype(np.int64)


def fingerprint64(texts) -> np.ndarray:
    """Rolling polynomial fingerprint of the whole text, returned as
    int64 — the document-identity hash for exact dedup.

    Two independent 31-bit Mersenne rolling hashes packed into 62 bits,
    computed VECTORIZED ACROSS DOCUMENTS: texts left-pad with zero
    bytes (a zero byte contributes 0 * B^k — padding is free), then one
    Horner step per byte POSITION updates every document at once.  The
    per-byte-per-doc Python loop this replaces was ~100x slower; the
    31-bit moduli keep every intermediate inside uint64."""
    n = len(texts)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    MOD = np.uint64((1 << 31) - 1)
    BASES = (np.uint64(257), np.uint64(263))
    # None fingerprints like "" but is flagged afterwards with an
    # out-of-range sentinel (rolling hashes are < 2^31 per half, so
    # MOD<<31|MOD is unreachable for real texts)
    null_rows = np.fromiter((t is None for t in texts), dtype=bool,
                            count=n)
    bufs = [b"" if t is None else t.encode("utf-8") for t in texts]
    maxlen = max(len(b) for b in bufs)
    mat = np.zeros((n, maxlen), dtype=np.uint8)
    for i, b in enumerate(bufs):
        if b:
            mat[i, maxlen - len(b):] = np.frombuffer(b, dtype=np.uint8)
    h1 = np.zeros(n, dtype=np.uint64)
    h2 = np.zeros(n, dtype=np.uint64)
    for col in range(maxlen):
        c = mat[:, col].astype(np.uint64)
        h1 = (h1 * BASES[0] + c) % MOD
        h2 = (h2 * BASES[1] + c) % MOD
    if null_rows.any():
        h1[null_rows] = MOD
        h2[null_rows] = MOD
    return ((h1 << np.uint64(31)) | h2).view(np.int64)


# dedup key for NULL texts: SQL GROUP BY puts every NULL in ONE group,
# so all nulls share one fixed key.  The `person` parameter keys a
# separate blake2b family no real text can reach, so a null never
# collides with a content hash beyond the usual 2^-64.
_NULL_HASH64 = int.from_bytes(
    blake2b(b"", digest_size=8, person=b"nulltext").digest(), "little")


def content_hash64(texts) -> np.ndarray:
    """Stable blake2b-64 of the exact text (dedup key).  None hashes
    to the fixed null-group key (SQL groups all NULLs together)."""
    out = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        out[i] = _NULL_HASH64 if t is None else int.from_bytes(
            blake2b(t.encode("utf-8"), digest_size=8).digest(), "little")
    return out.view(np.int64)


def shingles(text: str, k: int = 3) -> list[str]:
    """k-token shingles (space-joined) of the whitespace tokens.

    Texts with fewer than k tokens yield NO shingles — matching the
    SQL oracle (UNNEST(range(1, len-1)) is empty there), so short-doc
    behavior cannot diverge between engine and oracle."""
    toks = tokenize_ws(text)
    if len(toks) < k:
        return []
    return [" ".join(toks[j:j + k]) for j in range(len(toks) - k + 1)]


def _hash_str_u64(s: str) -> int:
    return int.from_bytes(blake2b(s.encode("utf-8"), digest_size=8).digest(),
                          "little")


# 31-bit hash universe so (a*h + b) fits in uint64 without overflow
_MERSENNE31 = np.uint64((1 << 31) - 1)


def minhash_params(num_perm: int = 64, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """Multiply-shift family: odd 64-bit multipliers + additive offsets,
    evaluated with WRAPPING uint64 arithmetic (no modulo — the mod-p
    variant cost ~10x in the batch kernel's hot loop)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 63, size=num_perm, dtype=np.uint64) \
        * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(text: str, a: np.ndarray, b: np.ndarray,
                      k: int = 3, sh: list[str] | None = None) -> np.ndarray:
    """Per-document MinHash signature (uint64[num_perm]) over k-token
    shingles — the readable REFERENCE for :func:`minhash_batch` (the
    batch kernel must agree exactly; tests pin it).  Shingle hashes
    derive from per-token siphash so the batch path can compute them
    without materializing shingle strings."""
    if sh is None:
        sh = shingles(text, k)
    if not sh:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    toks = tokenize_ws(text)
    th = _token_hash_u64(toks)
    hv = _combine_shingle_hashes(th, k)
    prod = hv[:, None] * a[None, :] + b[None, :]      # wrapping uint64
    return prod.min(axis=0)


def _token_hash_u64(tokens) -> np.ndarray:
    """Deterministic u64 per token, hashed in C (pandas siphash over
    the whole array — no per-string Python hashing)."""
    import pandas as pd

    if not len(tokens):
        return np.zeros(0, dtype=np.uint64)
    return pd.util.hash_array(np.asarray(tokens, dtype=object))


_MIX_MUL1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX_MUL2 = np.uint64(0x94D049BB133111EB)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized (wrapping uint64 arithmetic)."""
    x = np.asarray(x, dtype=np.uint64).copy()
    x ^= x >> np.uint64(30)
    x *= _MIX_MUL1
    x ^= x >> np.uint64(27)
    x *= _MIX_MUL2
    x ^= x >> np.uint64(31)
    return x


def _combine_shingle_hashes(th: np.ndarray, k: int) -> np.ndarray:
    """Token-hash array -> 31-bit shingle hash per window of k
    consecutive tokens (len(th) - k + 1 windows; caller guarantees
    len(th) >= k).  Works on a FLAT cross-document array: windows that
    straddle a document boundary are computed too and must be masked
    out by the caller."""
    acc = np.zeros(len(th) - k + 1, dtype=np.uint64)
    for j in range(k):
        acc = _mix64(acc ^ th[j:len(th) - k + 1 + j])
    return acc >> np.uint64(33)


def minhash_batch(texts, a: np.ndarray, b: np.ndarray, k: int = 3):
    """MinHash signatures for a WHOLE BATCH with no per-document
    Python: Arrow splits tokens, pandas siphash hashes every token in
    one C call, shingle hashes are a k-step vectorized mix over the
    flat cross-document token-hash array, and the (a*h+b) min-reduce
    runs ``np.minimum.reduceat`` per permutation chunk.

    Returns ``(doc_idx, sig)``: int64 indices of the documents that
    HAVE shingles (>= k tokens — shingle-less docs are dropped, same
    contract as :func:`shingles`), and their uint64 signature matrix
    ``(len(doc_idx), num_perm)``.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    n = len(texts)
    if n == 0:
        return np.zeros(0, np.int64), np.zeros((0, len(a)), np.uint64)
    col = pc.utf8_trim_whitespace(pc.fill_null(
        pa.array(list(texts), pa.string()), ""))
    toks = pc.split_pattern_regex(col, pattern=r"\s+")
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    # flat-layout offsets come from the RAW split counts; a
    # trimmed-empty text splits to [''] (one flat slot) but tokenizes
    # to no tokens, so its EFFECTIVE count is zero
    eff = counts.copy()
    empty = pc.equal(pc.utf8_length(col), 0).to_numpy(zero_copy_only=False)
    eff[empty] = 0
    flat = toks.flatten()
    th = _token_hash_u64(flat.to_numpy(zero_copy_only=False))
    if len(th) < k:
        return np.zeros(0, np.int64), np.zeros((0, len(a)), np.uint64)
    sh = _combine_shingle_hashes(th, k)          # flat, incl. straddles
    # valid shingle windows live entirely inside one document
    tok_start = np.concatenate(([0], np.cumsum(counts)))[:-1]
    n_sh = np.maximum(eff - k + 1, 0)
    has = n_sh > 0
    doc_idx = np.nonzero(has)[0].astype(np.int64)
    if not len(doc_idx):
        return doc_idx, np.zeros((0, len(a)), np.uint64)
    # gather the valid windows: for doc d they are the n_sh[d] flat
    # positions starting at tok_start[d]
    starts = tok_start[has]
    lens = n_sh[has]
    out_starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    pos = (np.arange(int(lens.sum()), dtype=np.int64)
           - np.repeat(out_starts, lens) + np.repeat(starts, lens))
    shv = sh[pos]
    num_perm = len(a)
    sig = np.empty((len(doc_idx), num_perm), dtype=np.uint64)
    # chunk permutations to bound the (perm x n_shingles) intermediate;
    # PERM-MAJOR orientation: the shingle-major broadcast costs ~7x
    # (strided writes), and reduceat over axis=1 of a C-contiguous
    # block is another ~5x over axis=0
    for c0 in range(0, num_perm, 16):
        c1 = min(c0 + 16, num_perm)
        prod = a[c0:c1, None] * shv[None, :] + b[c0:c1, None]  # wrapping
        sig[:, c0:c1] = np.minimum.reduceat(prod, out_starts, axis=1).T
    return doc_idx, sig


def shingle_explode(texts, k: int = 3):
    """All valid k-token shingle STRINGS for a whole batch with no
    per-document Python (the round-5 vectorization of the
    ``for txt: set(shingles(txt))`` hot loops): Arrow regex split ->
    flat cross-document token array -> ONE windowed
    ``binary_join_element_wise`` (k shifted zero-copy slices joined
    with spaces) -> numpy gather of the windows that live entirely
    inside one document (same layout math as :func:`minhash_batch`).

    Returns ``(doc_idx, shingle)``: int64 indices into ``texts`` (one
    per shingle occurrence, in document order, duplicates included)
    and the matching StringArray — exactly the strings
    :func:`shingles` yields per doc (equivalence pinned in tests).
    Callers needing per-doc DISTINCT shingles dedup with one C-level
    ``pandas.drop_duplicates`` over (doc_idx, shingle)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    empty = (np.zeros(0, np.int64), pa.array([], pa.string()))
    if len(texts) == 0:
        return empty
    col = texts if isinstance(texts, (pa.Array, pa.ChunkedArray)) \
        else pa.array(list(texts), pa.string())
    col = pc.utf8_trim_whitespace(pc.fill_null(col, ""))
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    toks = pc.split_pattern_regex(col, pattern=r"\s+")
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    # flat-layout offsets use the RAW split counts; a trimmed-empty
    # text splits to [''] (one flat slot) but has zero tokens
    eff = counts.copy()
    emptym = pc.equal(pc.utf8_length(col), 0) \
        .to_numpy(zero_copy_only=False)
    eff[emptym] = 0
    flat = toks.flatten()
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    if len(flat) < k:
        return empty
    m = len(flat) - k + 1
    # windowed join: row i of the output is flat[i] + " " + ... +
    # flat[i+k-1] — every window, including cross-document straddles,
    # in one C kernel; the straddles are dropped by the gather below
    sh = pc.binary_join_element_wise(
        *[flat.slice(j, m) for j in range(k)], " ")
    tok_start = np.concatenate(([0], np.cumsum(counts)))[:-1]
    n_sh = np.maximum(eff - k + 1, 0)
    has = n_sh > 0
    if not has.any():
        return empty
    starts = tok_start[has]
    lens = n_sh[has]
    out_starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    pos = (np.arange(int(lens.sum()), dtype=np.int64)
           - np.repeat(out_starts, lens) + np.repeat(starts, lens))
    doc_idx = np.repeat(np.nonzero(has)[0].astype(np.int64), lens)
    return doc_idx, sh.take(pa.array(pos))


def band_digests(sig: np.ndarray, bands: int) -> np.ndarray:
    """(n, num_perm) signature matrix -> (n, bands) int64 digests, one
    mixing chain per band (equality-only use; vectorized across the
    batch — replaces a per-(doc, band) blake2b)."""
    n, num_perm = sig.shape
    r = num_perm // bands
    out = np.empty((n, bands), dtype=np.uint64)
    for bi in range(bands):
        v = np.full(n, np.uint64(bi + 1), dtype=np.uint64)
        for j in range(r):
            v = _mix64(v ^ sig[:, bi * r + j])
        out[:, bi] = v
    return out.view(np.int64)


_BIT_IDX = np.arange(64, dtype=np.uint64)


def simhash64(texts, k: int = 1) -> np.ndarray:
    """64-bit SimHash over token (k=1) features, count-weighted.

    Per doc, all feature hashes unpack to a (n_feats, 64) bit matrix
    in one vectorized block (the per-feature Python loop cost 64 numpy
    calls per token); the blake2b per distinct feature remains the
    irreducible part."""
    out = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        feats = shingles(t, k) if k > 1 else tokenize_ws(t)
        if not feats:
            out[i] = 0
            continue
        hv = np.array([_hash_str_u64(f) for f in feats], dtype=np.uint64)
        bits = ((hv[:, None] >> _BIT_IDX) & np.uint64(1)).astype(np.int64)
        acc = (2 * bits - 1).sum(axis=0)
        bitsv = (acc > 0).astype(np.uint64)
        out[i] = np.bitwise_or.reduce(bitsv << _BIT_IDX)
    return out.view(np.int64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise Hamming distance of two int64 vectors."""
    x = (np.asarray(a).view(np.uint64) ^ np.asarray(b).view(np.uint64))
    cnt = np.zeros(len(x), dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return cnt


def jaccard_tokens(a: str, b: str, k: int = 3) -> float:
    """Shingle-set Jaccard.  Two shingle-less texts (< k tokens) score
    0.0 — the SQL oracle produces no pairs for them (no shingles to
    join on), so the engine must not either."""
    sa, sb = set(shingles(a, k)), set(shingles(b, k))
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)
