"""Driver contract for the graft builder (Ray Data target).

- ``entry()``: flagship pipeline — the full synthetic crawl
  (seeds -> frontier actors -> fetch -> parse) returning the records
  Dataset.  Ray is initialised by the driver; nothing here calls
  ``ray.init``/``ray.shutdown``.
- ``queries()``: one callable per implemented operator/pipeline from
  SURVEY.md §2 (+ the training-data operator suite); each takes
  ``sf_dir`` and returns a Dataset / pandas DataFrame / pyarrow Table.
- ``oracle_sql()``: DuckDB-equivalent SQL for every SQL-expressible
  query, same column names (integer cents for float aggregates so
  value hashes can't drift).  Non-SQL-expressible ops (crawl
  ordering/state, LSH/IVF approximations, engine-defined hashes) are
  intentionally absent -> rows-only checks.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: the synthetic-corpus crawl (BASELINE.json north_rule).

    The corpus is deterministic (seed=42) per the input_hint schema —
    the crawl's "network" is content-addressed into it, so no external
    data is touched.  sf0.001-scale by construction (~150 images,
    ~200 seed URLs).
    """
    from hepcrawl_ray.pipelines.queries import q_crawl_records

    return q_crawl_records("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from hepcrawl_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from hepcrawl_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
