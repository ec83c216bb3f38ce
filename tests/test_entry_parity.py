"""Mimics the driver's correctness gate: every queries() entry with an
oracle_sql() is run on sf0.01 through BOTH the Ray pipeline and DuckDB, and
compared column-sorted + row-sorted (the driver's order-insensitive check)."""

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.sql(sql).df()


def _norm(obj) -> pd.DataFrame:
    df = pd.DataFrame(obj).copy()
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype == "bool":
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
    return df


SQL_CHECKED = sorted(entrymod.oracle_sql())


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_sql_parity(name, ray_session):
    got = _norm(entrymod.queries()[name](SF))
    want = _norm(_duck(entrymod.oracle_sql()[name]))
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_rows_only_queries_run(ray_session):
    q = entrymod.queries()
    for name in sorted(set(q) - set(SQL_CHECKED)):
        out = pd.DataFrame(q[name](SF))
        assert len(out) >= 0
        assert out.columns.size >= 1


def test_entry_smoke(ray_session):
    out = entrymod.entry()
    assert len(out) > 0
    assert set(out.columns) == {"qid", "rank", "doc_id", "score"}


def test_every_query_is_oracled():
    """Invariant since round 3: EVERY queries() entry has a SQL twin —
    the driver's correctness gate covers the whole surface (no rows-only
    entries). A new entry without an oracle fails here, not in review."""
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert q == o, (sorted(q - o), sorted(o - q))
