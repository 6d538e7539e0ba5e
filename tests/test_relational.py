"""Driver-mimic correctness harness: run every queries() entry at
sf0.01 and compare against its oracle_sql() twin via DuckDB exactly the
way the driver does — row count + schema + order-insensitive value
hash (SURVEY.md §5.2 item 4)."""

import hashlib

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _to_df(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    raise TypeError(type(result))


def _value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(
        df.astype(str).itertuples(index=False, name=None)
    )
    h = hashlib.md5()
    for r in rows:
        h.update(("\x1f".join(r) + "\x1e").encode())
    return h.hexdigest()


ORACLE = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(name, con, ray_session):
    ray_df = _to_df(QUERIES[name](SF_DIR))
    sql_df = con.execute(ORACLE[name]).fetchdf()
    assert len(ray_df) == len(sql_df), f"{name}: rows {len(ray_df)} vs {len(sql_df)}"
    assert sorted(ray_df.columns) == sorted(sql_df.columns), (
        f"{name}: cols {sorted(ray_df.columns)} vs {sorted(sql_df.columns)}"
    )
    assert _value_hash(ray_df) == _value_hash(sql_df), f"{name}: value hash mismatch"


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES) - set(ORACLE) - {"learned_extract"})
)
def test_rows_only_queries_run(name, ray_session):
    df = _to_df(QUERIES[name](SF_DIR))
    assert len(df) >= 0
    assert len(df.columns) > 0


def test_learned_extract_runs(ray_session):
    df = _to_df(QUERIES["learned_extract"](SF_DIR))
    assert (df["status"] == "ok").sum() > 0
