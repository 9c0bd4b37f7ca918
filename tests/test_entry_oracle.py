"""Driver-contract replication: every __spark_entry__ query vs its DuckDB
oracle at sf0.001 (row count + column set + order-insensitive value hash) —
the same comparison the driver runs at sf0.01."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.compare_oracle import TABLES, canon, value_hash  # noqa: E402

import __spark_entry__ as entry  # noqa: E402

SF_DIR = os.environ.get("TSENGINE_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/events.parquet"), reason="testdata missing"
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def test_entry_smoke(spark):
    df = entry.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"conv_id", "bucket_ts", "metric", "cnt", "mean", "std_pop"}


# entries with no ANSI-SQL oracle (iterative training loops etc.) — the
# driver records a rows-only check for these; keep the set EXPLICIT so a
# forgotten oracle fails this test instead of silently weakening coverage.
# vec_opq_topk: the OPQ rotation needs an eigendecomposition ANSI SQL
# cannot express — gated by numpy-twin tests instead (tests/test_vecops.py,
# disclosed in its docstring). Everything else is SQL-checked.
NON_SQL_QUERIES: set[str] = {"vec_opq_topk"}


def test_every_query_has_oracle_or_is_flagged():
    qs, osql = entry.queries(), entry.oracle_sql()
    assert set(osql) <= set(qs)
    assert set(qs) - set(osql) == NON_SQL_QUERIES


@pytest.mark.parametrize("name", sorted(NON_SQL_QUERIES))
def test_non_sql_query_runs(spark, name):
    """Rows-only gate for the declared non-SQL entries: runs, yields rows,
    stable schema."""
    df = entry.queries()[name](spark, SF_DIR)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) > 0


@pytest.mark.parametrize("name", sorted(entry.oracle_sql()))
def test_query_matches_oracle(spark, duck, name):
    sdf = entry.queries()[name](spark, SF_DIR).toPandas()
    odf = duck.sql(entry.oracle_sql()[name]).df()
    assert len(sdf) == len(odf), f"{name}: row count {len(sdf)} != {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns), f"{name}: columns differ"
    if value_hash(sdf) != value_hash(odf):
        a, b = canon(sdf), canon(odf)
        diff = (a != b) & ~(a.isna() & b.isna())
        bad = diff.any(axis=1)
        i = bad.idxmax()
        raise AssertionError(
            f"{name}: value mismatch at row {i}:\n spark {a.loc[i].to_dict()}\n duck  {b.loc[i].to_dict()}"
        )
