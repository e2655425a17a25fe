"""Driver-contract rehearsal (SURVEY.md §5.2-2): every queries() entry
with an oracle_sql() runs on Spark AND DuckDB at sf0.01 and must match
row-for-row (order-insensitive, columns sorted by name) — the same
comparison CORRECTNESS_r{N}.json records."""

import datetime as dt
import math

import duckdb
import pytest

from mergeaddressesandbuildings_spark.plans import queries as Q

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return v
    if isinstance(v, dt.date):
        return v.isoformat()
    return v


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # key=repr: NULLs are not ordered against ints in plain tuple sort
    return sorted((tuple(_norm(r[i]) for i in order) for r in rows), key=repr)


PAIRED = sorted(Q.ORACLE)


@pytest.mark.parametrize("name", PAIRED)
def test_query_matches_oracle(spark, duck, name):
    sdf = Q.QUERIES[name](spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    rel = duck.sql(Q.ORACLE[name])
    d_cols = [c for c in rel.columns]
    d_rows = rel.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: columns {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"{name}: rowcount {len(s_rows)} vs {len(d_rows)}"
    got = _rowset(s_cols, s_rows)
    want = _rowset(d_cols, d_rows)
    mism = [(g, w) for g, w in zip(got, want) if g != w]
    assert got == want, f"{name}: {len(mism)} differing rows; first 3: {mism[:3]}"


def test_rows_only_queries_run(spark):
    for name in sorted(set(Q.QUERIES) - set(Q.ORACLE)):
        df = Q.QUERIES[name](spark, SF_DIR)
        n = df.count()
        assert n >= 0
        assert df.columns, name
