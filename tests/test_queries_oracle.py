"""Local mirror of the driver's correctness gate: run every queries()
entry at sf0.001 and compare row-count + sorted-column value content
against oracle_sql() via DuckDB.  Non-SQL queries get a rows/schema
smoke check."""

import os

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entry_mod

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(SF_DIR, t)}.parquet')")
    return con


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        df = result.to_pandas()
        if df.shape[1] == 0:
            # Ray's to_pandas drops empty blocks, losing the schema of
            # an all-empty result; recover the typed empty from the
            # plan schema (queries seed it — pipelines/queries.py
            # _with_output_schema)
            pinned = getattr(result, "_hepcrawl_schema", None)
            if pinned is not None:
                return pinned.empty_table().to_pandas()
            try:
                s = result.schema(fetch_if_missing=False)
                if s is None:
                    s = result.schema(fetch_if_missing=True)
            except Exception:
                s = None   # Ray asserts re-executing consumed plans
            if s is not None and len(s.names):
                df = pa.schema(list(zip(s.names, s.types))) \
                    .empty_table().to_pandas()
        return df
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            # canonicalize missing first: engine-side NaN and
            # oracle-side None both stringify as "None"
            df[c] = df[c].where(pd.notna(df[c]), None).astype(str)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    # unify integer widths
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df


SQL_QUERIES = sorted(entry_mod.oracle_sql())
ALL_QUERIES = sorted(entry_mod.queries())


@pytest.mark.parametrize("name", SQL_QUERIES)
def test_query_matches_oracle(ray_session, duck, name):
    q = entry_mod.queries()[name]
    got = normalize(to_pandas(q(SF_DIR)))
    want = normalize(duck.sql(entry_mod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns), \
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    # dtype-strict: the driver value-hash distinguishes int64 from
    # float64 (DuckDB HUGEINT sums drift to float64 unless the oracle
    # CASTs back to BIGINT), so the mirror must too.
    pd.testing.assert_frame_equal(got, want, check_exact=True, obj=name)


@pytest.mark.parametrize("name", [n for n in ALL_QUERIES if n not in SQL_QUERIES])
def test_rows_only_queries_run(ray_session, name):
    q = entry_mod.queries()[name]
    got = to_pandas(q(SF_DIR))
    assert got is not None
    assert len(got.columns) > 0
    # every rows-only query has a deterministic non-empty output; a
    # 0-row result means a broken pipeline (e.g. drain-without-seal),
    # not an empty corpus.
    assert len(got) > 0, f"{name}: returned 0 rows"


def test_entry_smoke(ray_session):
    res = entry_mod.entry()
    df = to_pandas(res)
    assert len(df) > 0
