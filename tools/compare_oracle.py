"""Driver-replica correctness harness: run every __spark_entry__ query on
Spark AND its DuckDB oracle, compare row count, schema (column names), and
an order-insensitive value hash. Usage:

    python tools/compare_oracle.py [sf_dir] [query ...]

Exit code 0 iff every query matches.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tsengine.env_tuning import setdefault_simd  # noqa: E402

setdefault_simd()  # before numpy/pandas import (see env_tuning.py)

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical form: columns sorted by name, rows sorted by all columns,
    floats rounded (the driver compares a value hash on our already-rounded
    outputs; re-rounding at 9 here only guards stray representation noise)."""
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        if out[c].dtype == object:
            out[c] = out[c].astype(str)
        elif str(out[c].dtype).startswith("float"):
            out[c] = out[c].round(9)
        elif "datetime" in str(out[c].dtype):
            out[c] = pd.to_datetime(out[c]).dt.tz_localize(None).astype("datetime64[us]")
        elif str(out[c].dtype) in ("int32", "int8", "int16", "uint32"):
            out[c] = out[c].astype("int64")
        elif str(out[c].dtype) == "bool":
            out[c] = out[c].astype("int64")
        elif str(out[c].dtype) == "decimal":
            out[c] = out[c].astype("float64").round(9)
    out = out.sort_values(list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def value_hash(df: pd.DataFrame) -> str:
    return hashlib.md5(canon(df).to_csv(index=False, float_format="%.9g").encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from tsengine.session import get_spark

    spark = get_spark(master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, osql = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failures.append(name)
            continue
        if name not in osql:
            print(f"weak {name}: rows={len(sdf)} (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.sql(osql[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {str(ex)[:300]}")
            failures.append(name)
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} != {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} != {sorted(odf.columns)}")
        if not problems and value_hash(sdf) != value_hash(odf):
            problems.append("value-hash mismatch")
            a, b = canon(sdf), canon(odf)
            diff = (a != b) & ~(a.isna() & b.isna())
            bad = diff.any(axis=1)
            if bad.any():
                i = bad.idxmax()
                print(f"  first diff row {i}:\n  spark: {a.loc[i].to_dict()}\n  duck:  {b.loc[i].to_dict()}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
            failures.append(name)
        else:
            print(f"ok   {name}: rows={len(sdf)} [{time.time()-t0:.1f}s]")

    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL MATCH")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
