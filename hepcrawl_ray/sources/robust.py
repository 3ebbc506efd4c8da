"""Robust parquet ingestion: distributed footer probing + corrupt-file
quarantine.

At 100 TB an input directory WILL contain truncated or corrupt shards
(killed writers, partial uploads).  A plain ``read_parquet`` over the
directory throws on the first bad footer and the whole job dies; the
reference's posture is errors-as-items, never job death
(hepcrawl/middlewares.py:42-55 error accumulation, DESY per-file error
rows, desy_spider.py:219-231).  This module keeps that contract at the
FILE level:

1. **Probe** (distributed): every candidate file's parquet FOOTER is
   opened in a ``map_batches`` task — footer-only, bytes read are
   O(metadata), not O(file).  A file that fails to open yields a
   quarantine row (path, error) instead of an exception.
2. **Read** (pruned): only files that passed the probe go to the real
   ``ray.data.read_parquet`` — which then streams normally with
   column pruning etc.

The probe costs one metadata round per file and buys job survival;
the quarantine table is the retry/alert work-list.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq


def probe_parquet_files(paths: list[str]) -> "ray.data.Dataset":
    """Distributed footer probe: (path, ok, n_rows, error) per file."""
    import ray

    def probe(t: pa.Table) -> pa.Table:
        out_p, out_ok, out_rows, out_err = [], [], [], []
        for p in t.column("path").to_pylist():
            try:
                md = pq.ParquetFile(p).metadata
                out_ok.append(True)
                out_rows.append(int(md.num_rows))
                out_err.append("")
            except Exception as exc:  # corrupt footer / truncation
                out_ok.append(False)
                out_rows.append(0)
                out_err.append(f"{type(exc).__name__}: {exc}"[:200])
            out_p.append(p)
        return pa.table({
            "path": pa.array(out_p, pa.string()),
            "ok": pa.array(out_ok, pa.bool_()),
            "n_rows": pa.array(out_rows, pa.int64()),
            "error": pa.array(out_err, pa.string()),
        })

    return ray.data.from_items(
        [{"path": p} for p in paths]).map_batches(
        probe, batch_format="pyarrow", batch_size=64)


def read_parquet_robust(paths: list[str], *, columns=None):
    """Read every HEALTHY file among ``paths``; quarantine the rest.

    Returns ``(rows_dataset, quarantine_table)`` — the quarantine is a
    driver-side pyarrow Table (file-list-sized, tiny by definition)
    with (path, error) for each skipped shard.  The rows Dataset is a
    plain pruned ``read_parquet`` over the surviving files, so all the
    normal streaming/pruning behavior applies downstream."""
    import ray

    probed = probe_parquet_files(paths).take_all()
    good = [r["path"] for r in probed if r["ok"]]
    bad = [(r["path"], r["error"]) for r in probed if not r["ok"]]
    quarantine = pa.table({
        "path": pa.array([p for p, _ in bad], pa.string()),
        "error": pa.array([e for _, e in bad], pa.string()),
    })
    if not good:
        return None, quarantine
    ds = ray.data.read_parquet(sorted(good), columns=columns)
    return ds, quarantine
