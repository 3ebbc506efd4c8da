"""BPE tokenizer TRAINING (merge learning) over a document corpus.

The counting pass is the corpus-scale work and runs distributed; the
merge loop runs over the word-frequency table, which is vocabulary-
sized (empirically ~sqrt of corpus tokens; single-digit millions of
rows at 100 TB — driver-resident by design, like every tokenizer
trainer).  Reference analog: none (hepcrawl has no tokenizer); this is
part of the training-data operator suite mandated by the brief.

Algorithm (Sennrich-style, deterministic):
- words = ``\\S+`` pre-tokens of ``text``; symbols start as unicode
  chars.
- each round merges the adjacent symbol pair with the highest total
  count (ties: lexicographically smallest ``(left, right)`` pair);
  occurrences merge leftmost-first, non-overlapping.
- stops after ``n_merges`` rounds or when no pair occurs twice.

Scale shape: per-batch word counting collapses each batch to its
distinct words (pandas C), one word-bucket shuffle sums counts, and
ONLY the (word, count) vocabulary leaves the cluster.  The merge loop
is vectorized: the whole vocabulary is ONE flat int32 symbol array;
pair counting is a 64-bit key bincount-by-inverse, replacement is a
boolean-mask compaction — no per-word Python in the loop.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

_WORD_RE = re.compile(r"\S+")


# ------------------------------------------------- distributed counting ----

def word_count_dataset(ds, col: str = "text", n_buckets: int = 64):
    """documents Dataset -> (word, n) Dataset via per-batch collapse +
    one word-keyed bucket shuffle."""

    def partial(t: pa.Table) -> pa.Table:
        texts = t.column(col).to_pylist()
        words: list[str] = []
        for s in texts:
            if s:
                words.extend(_WORD_RE.findall(s))
        if not words:
            return pa.table({"word": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "_bucket": pa.array([], pa.int64())})
        vc = pd.Series(words).value_counts()
        w = vc.index.to_numpy(dtype=object)
        h = pd.util.hash_array(w)
        return pa.table({"word": pa.array(w, pa.string()),
                         "n": pa.array(vc.to_numpy(np.int64)),
                         "_bucket": pa.array((h % n_buckets).astype(np.int64))})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("word", as_index=False)["n"].sum()
        out["n"] = out["n"].astype("int64")
        return out

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(combine, batch_format="pandas"))


# ------------------------------------------------- vectorized merge loop ----

def learn_merges(words: list[str], counts: np.ndarray,
                 n_merges: int = 50) -> list[tuple[str, str, int]]:
    """(word, count) vocabulary -> ordered merge list
    [(left, right, pair_count_at_merge_time), ...]."""
    if not words:
        return []
    sym_of: dict[str, int] = {}
    syms: list[str] = []
    flat_ids: list[int] = []
    word_of_l: list[int] = []
    for wi, w in enumerate(words):
        for ch in w:
            i = sym_of.get(ch)
            if i is None:
                i = sym_of[ch] = len(syms)
                syms.append(ch)
            flat_ids.append(i)
            word_of_l.append(wi)
    flat = np.asarray(flat_ids, dtype=np.int64)
    word_of = np.asarray(word_of_l, dtype=np.int64)
    wcount = np.asarray(counts, dtype=np.int64)[word_of]

    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        if len(flat) < 2:
            break
        valid = word_of[:-1] == word_of[1:]
        if not valid.any():
            break
        a = flat[:-1][valid]
        b = flat[1:][valid]
        w = wcount[:-1][valid]
        keys = (a << 32) | b
        uniq, inv = np.unique(keys, return_inverse=True)
        totals = np.bincount(inv, weights=w).astype(np.int64)
        top = int(totals.max())
        if top < 2:
            break
        # deterministic tie-break: lexicographically smallest (l, r)
        cand = uniq[totals == top]
        pair_strs = [(syms[int(k >> 32)], syms[int(k & 0xFFFFFFFF)])
                     for k in cand]
        left, right = min(pair_strs)
        ai, bi = sym_of[left], sym_of[right]
        merges.append((left, right, top))
        new_sym = left + right
        ni = sym_of.get(new_sym)
        if ni is None:
            ni = sym_of[new_sym] = len(syms)
            syms.append(new_sym)
        # leftmost non-overlapping replacement
        pos = np.flatnonzero((flat[:-1] == ai) & (flat[1:] == bi)
                             & (word_of[:-1] == word_of[1:]))
        if len(pos) == 0:            # pair only existed pre-merge rounds
            continue
        keep: list[int] = []
        last = -2
        for p in pos.tolist():       # loop over MATCHES only (sparse)
            if p > last + 1:
                keep.append(p)
                last = p
        kp = np.asarray(keep, dtype=np.int64)
        flat[kp] = ni
        mask = np.ones(len(flat), dtype=bool)
        mask[kp + 1] = False
        flat = flat[mask]
        word_of = word_of[mask]
        wcount = wcount[mask]
    return merges


def train_bpe(ds, col: str = "text", n_merges: int = 50) -> pd.DataFrame:
    """End to end: distributed word counts -> driver merge loop ->
    merges table (rank, left, right, pair_count)."""
    vocab = word_count_dataset(ds, col=col).to_pandas()
    # deterministic driver order (shuffle output order is not)
    vocab = vocab.sort_values("word").reset_index(drop=True)
    merges = learn_merges(vocab["word"].tolist(),
                          vocab["n"].to_numpy(np.int64),
                          n_merges=n_merges)
    return pd.DataFrame({
        "rank": pd.Series(range(len(merges)), dtype="int64"),
        "left": [m[0] for m in merges],
        "right": [m[1] for m in merges],
        "pair_count": pd.Series([m[2] for m in merges], dtype="int64")})


# --------------------------------------------------- apply (encode) ----

def encode_word(word: str, ranks: dict[tuple[str, str], int]
                ) -> tuple[str, ...]:
    """GPT-2-style encode: repeatedly merge the lowest-rank adjacent
    pair (all non-overlapping occurrences, leftmost-first) until no
    learned pair remains."""
    symbols: list[str] = list(word)
    while len(symbols) >= 2:
        best_rank = None
        for i in range(len(symbols) - 1):
            r = ranks.get((symbols[i], symbols[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                left, right = symbols[i], symbols[i + 1]
        if best_rank is None:
            break
        out: list[str] = []
        i = 0
        while i < len(symbols):
            if (i + 1 < len(symbols) and symbols[i] == left
                    and symbols[i + 1] == right):
                out.append(left + right)
                i += 2
            else:
                out.append(symbols[i])
                i += 1
        symbols = out
    return tuple(symbols)


def encode_token_counts(ds, merges: pd.DataFrame, col: str = "text",
                        id_col: str = "doc_id"):
    """Apply learned merges: per-doc encoded-token counts.

    Scale shape: the merge table (vocabulary-sized) is closure state —
    shipped once per task, never per row; each batch encodes only its
    DISTINCT words (Zipf makes the memo hit rate high) and the per-doc
    count is a vectorized weighted sum over the word positions."""
    ranks = {(l, r): i for i, (l, r) in
             enumerate(zip(merges["left"], merges["right"]))}

    def f(t: pa.Table) -> pa.Table:
        texts = t.column(col).to_pylist()
        memo: dict[str, int] = {}
        counts = np.zeros(len(texts), dtype=np.int64)
        for i, s in enumerate(texts):
            if not s:
                continue
            total = 0
            for w in _WORD_RE.findall(s):
                n = memo.get(w)
                if n is None:
                    n = memo[w] = len(encode_word(w, ranks))
                total += n
            counts[i] = total
        return pa.table({id_col: t.column(id_col),
                         "n_bpe_tokens": pa.array(counts)})

    return ds.map_batches(f, batch_format="pyarrow")


# ------------------------------------------- single-process reference ----

def reference_bpe(texts: list[str], n_merges: int = 50
                  ) -> list[tuple[str, str, int]]:
    """Textbook string-based implementation (per-word Python loops) —
    deliberately INDEPENDENT of the vectorized path; tests pin
    equality between the two."""
    from collections import Counter

    wc: Counter = Counter()
    for s in texts:
        if s:
            wc.update(_WORD_RE.findall(s))
    vocab: dict[str, tuple[str, ...]] = {w: tuple(w) for w in wc}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, symbols in vocab.items():
            c = wc[w]
            for i in range(len(symbols) - 1):
                pairs[(symbols[i], symbols[i + 1])] += c
        if not pairs:
            break
        top = max(pairs.values())
        if top < 2:
            break
        left, right = min(p for p, c in pairs.items() if c == top)
        merges.append((left, right, top))
        new = left + right
        out: dict[str, tuple[str, ...]] = {}
        for w, symbols in vocab.items():
            res: list[str] = []
            i = 0
            while i < len(symbols):
                if (i + 1 < len(symbols) and symbols[i] == left
                        and symbols[i + 1] == right):
                    res.append(new)
                    i += 2
                else:
                    res.append(symbols[i])
                    i += 1
            out[w] = tuple(res)
        vocab = out
    return merges
