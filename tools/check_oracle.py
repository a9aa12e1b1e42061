"""Local stand-in for the driver's correctness gate: run every
``__spark_entry__.queries()`` entry against its ``oracle_sql()`` DuckDB
oracle at sf0.01 and exact-compare (row count, column names, values with
columns sorted by name and rows order-insensitive).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entrymod
from crawler_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: repr(v))
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entrymod.queries_all()
    oracles = entrymod.oracle_sql_all()
    unknown = only - set(qs)
    if unknown:
        print(f"unknown query names: {sorted(unknown)}", file=sys.stderr)
        return 2
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        spd = sdf.toPandas()
        if name not in oracles:
            print(f"[rows-only] {name}: {len(spd)} rows")
            continue
        opd = con.sql(oracles[name]).df()
        status = []
        if len(spd) != len(opd):
            status.append(f"ROWS spark={len(spd)} oracle={len(opd)}")
        if sorted(spd.columns) != sorted(opd.columns):
            status.append(f"COLS spark={sorted(spd.columns)} oracle={sorted(opd.columns)}")
        if not status:
            cs, co = canon(spd), canon(opd)
            if not cs.equals(co):
                neq = (cs != co).any(axis=1)
                idx = neq[neq].index[:3]
                diffs = [
                    f"row {i}: spark={cs.loc[i].to_dict()} oracle={co.loc[i].to_dict()}"
                    for i in idx
                ]
                status.append("VALUES differ; " + " | ".join(diffs))
        if status:
            failures.append(name)
            print(f"[FAIL] {name}: {'; '.join(status)}")
        else:
            print(f"[ok] {name}: {len(spd)} rows")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL MATCH")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
