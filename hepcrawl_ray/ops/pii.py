"""PII detection / redaction over a text column.

A training-data pipeline scrubs contact data before anything ships to
a model; the reference's analog is field-level scrubbing in the HEP
loaders (selective_remove_tags / strip processors,
hepcrawl/loaders.py:28-86) — generalized here to content-level PII.

Every kernel is pyarrow.compute (RE2), which is also DuckDB's regex
engine, so counts and replacements match a SQL oracle by construction.
Patterns are matched INDEPENDENTLY on the original text for counts
(documented: overlapping matches count under every pattern they hit),
then replaced in the fixed PII_PATTERNS order — replacement tokens
contain no digits or '@', so earlier replacements cannot create or
destroy later matches.

Scale shape: a stateless map_batches stage — no shuffle, no state, no
Python row loop; at 100 TB this is pure streaming compute.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# (name, RE2 pattern, replacement) — order is the replacement order
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def pii_counts(col) -> dict[str, pa.Array]:
    """Per-row match counts for every PII pattern (nullable int64
    Arrow arrays keyed ``n_{name}s``), computed independently on the
    original text.  NULL text rows count NULL — the SQL semantics
    (`len(regexp_extract_all(NULL, ...))` is NULL), not a silent 0."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    out = {}
    for name, pat, _ in PII_PATTERNS:
        out[f"n_{name}s"] = pc.cast(
            pc.count_substring_regex(col, pattern=pat), pa.int64())
    return out


def redact(col):
    """Replace every PII match with its token, in PII_PATTERNS order."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    for _, pat, repl in PII_PATTERNS:
        col = pc.replace_substring_regex(col, pattern=pat,
                                         replacement=repl)
    return col


def redact_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """map_batches body: counts + redacted text alongside every other
    column of the batch."""
    counts = pii_counts(t.column(text_col))
    t = t.set_column(t.schema.get_field_index(text_col), text_col,
                     redact(t.column(text_col)))
    for k, v in counts.items():
        t = t.append_column(k, v)
    return t
