"""Local replica of the driver's verification: each ``queries()[name]``
at sf0.01 must match ``oracle_sql()[name]`` through DuckDB (row count,
schema shape, order-insensitive values)."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con.sql(sql).df()


def _normalize(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _rows_match(a, b) -> bool:
    if list(a.columns) != list(b.columns) or len(a) != len(b):
        return False
    for c in a.columns:
        if a[c].dtype == "float64":
            if not all(
                (x == y) or (math.isnan(x) and math.isnan(y)) or abs(x - y) < 1e-9
                for x, y in zip(a[c], b[c])
            ):
                return False
        else:
            if not (a[c] == b[c]).all():
                return False
    return True


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_vs_oracle(spark, name):
    q = entry_mod.queries()[name]
    got = q(spark, SF_DIR).toPandas()
    assert got is not None
    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        assert len(got) >= 0  # rows-only contract
        return
    want = _duck(sql)
    g, w = _normalize(got), _normalize(want)
    assert list(g.columns) == list(w.columns), (name, g.columns, w.columns)
    assert len(g) == len(w), (name, len(g), len(w))
    assert _rows_match(g, w), f"{name}: value mismatch\n{g.head()}\n{w.head()}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"rank", "doc_id", "score"} <= set(df.columns)
