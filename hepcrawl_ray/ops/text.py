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

_WS = re.compile(r"\s+")

# small fixed stopword list — shared with the SQL oracle
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for")

# per-language marker words for the n-gram/stopword language heuristic
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "a", "in", "is"},
    "de": {"der", "die", "das", "und", "ist", "nicht"},
    "es": {"el", "la", "los", "que", "y", "es"},
    "fr": {"le", "la", "les", "et", "est", "une"},
}


def tokenize_ws(text: str) -> list[str]:
    """Whitespace tokens of the trimmed text (SQL-replicable)."""
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
    ``re``'s Unicode ``\\s`` is wider than RE2's ASCII ``\\s``)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
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
    return {"n_tokens": n_tokens, "chars_no_ws": chars_no_ws,
            "n_stopwords": n_stop, "has_digits": has_digits}


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
    bufs = [t.encode("utf-8") for t in texts]
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
    return ((h1 << np.uint64(31)) | h2).view(np.int64)


def content_hash64(texts) -> np.ndarray:
    """Stable blake2b-64 of the exact text (dedup key)."""
    out = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        out[i] = int.from_bytes(
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
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_MERSENNE31), size=num_perm, dtype=np.uint64)
    b = rng.integers(0, int(_MERSENNE31), size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(text: str, a: np.ndarray, b: np.ndarray,
                      k: int = 3, sh: list[str] | None = None) -> np.ndarray:
    """MinHash signature (uint64[num_perm]) over k-token shingles.
    Pass ``sh`` when the caller already computed the shingles (the
    tokenize+join is the dominant per-doc cost — don't do it twice)."""
    if sh is None:
        sh = shingles(text, k)
    if not sh:
        return np.full(len(a), _MERSENNE31)
    hv = np.array([_hash_str_u64(s) >> 33 for s in sh], dtype=np.uint64)
    # (a*h + b) mod p with h, a < 2^31 -> product < 2^62, no overflow
    prod = (hv[:, None] * a[None, :] + b[None, :]) % _MERSENNE31
    return prod.min(axis=0)


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
