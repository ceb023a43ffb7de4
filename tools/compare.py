#!/usr/bin/env python3
"""Dev-only mirror of the driver's DuckDB oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each query directory under <verifyOutDir>: load the Spark parquet
result, run the matching oracle SQL (oracle_sql.json) in DuckDB with views
over the sfDir parquet tables, sort columns by name, and compare values
row-by-row. Not part of the shipped library (the engine is Scala/Spark).
"""
import json
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_fail = 0
    import os
    names = sorted(
        d for d in os.listdir(out_dir)
        if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        got = con.sql(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        if name not in oracles:
            print(f"  {name}: NO-ORACLE rows={len(got)}")
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"✗ {name}: oracle SQL failed: {e}")
            n_fail += 1
            continue
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        if list(got.columns) != list(want.columns):
            print(f"✗ {name}: columns {list(got.columns)} != "
                  f"{list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"✗ {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        got = got.reset_index(drop=True)
        want = want.reset_index(drop=True)
        bad = None
        for c in got.columns:
            a, b = got[c], want[c]
            try:
                same = (a.astype(str) == b.astype(str)) | (
                    a.isna() & b.isna())
            except Exception:  # noqa: BLE001
                same = a == b
            if not bool(same.all()):
                i = int((~same).idxmax())
                bad = (c, i, a.iloc[i], b.iloc[i])
                break
        if bad:
            c, i, av, bv = bad
            print(f"✗ {name}: col {c} row {i}: spark={av!r} oracle={bv!r}")
            n_fail += 1
        else:
            print(f"✓ {name}: rows={len(got)}")
    print(f"{'FAIL' if n_fail else 'PASS'}: {n_fail} mismatching queries")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
