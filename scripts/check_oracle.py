"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at the given sf dir, compare
row count, column names, and an order-insensitive value hash (columns sorted
by name, rows sorted, values stringified with float rounding).

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from minhash_spark.session import get_spark
from minhash_spark.sources.tables import TESTDATA_TABLES


def canonical_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif "float" in str(df[c].dtype):
            df[c] = df[c].round(9).map(lambda v: f"{v:.9f}")
        else:
            df[c] = df[c].astype(str)
    rows = sorted("\x1f".join(r) for r in df.itertuples(index=False, name=None))
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from __spark_entry__ import queries, oracle_sql

    spark = get_spark("oracle-check", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = queries(), oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows, cols={list(sdf.columns)} "
                  f"({t_spark:.1f}s) [rows-only]")
            continue
        try:
            t0 = time.time()
            ddf = con.sql(oracles[name]).df()
            t_duck = time.time() - t0
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        problems = []
        if len(sdf) != len(ddf):
            problems.append(f"rowcount {len(sdf)} vs {len(ddf)}")
        if sorted(sdf.columns) != sorted(ddf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(ddf.columns)}")
        else:
            hs, hd = canonical_hash(sdf), canonical_hash(ddf)
            if hs != hd:
                problems.append(f"value hash {hs} vs {hd}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} "
                  f"(spark {t_spark:.1f}s, duckdb {t_duck:.1f}s)")
            failures.append(name)
        else:
            print(f"OK    {name}: {len(sdf)} rows "
                  f"(spark {t_spark:.1f}s, duckdb {t_duck:.1f}s)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
