#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query result
parquet written by graft.Verify, run the corresponding oracle SQL in DuckDB
over the same testdata tables and compare (schema by sorted column names,
values after per-column sort-insensitive normalization).

Usage: check_oracle.py <verifyOutDir> <sfDir>
"""
import json, math, sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in idx) for r in rows]
    return sorted(out)


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = n_skip = 0
    for name in sorted(p.name for p in Path(out_dir).iterdir() if p.is_dir()):
        got = con.sql(f"SELECT * FROM '{Path(out_dir) / name}/*.parquet'")
        gcols, grows = [d[0] for d in got.description], got.fetchall()
        if name not in oracle:
            print(f"  SKIP {name}: no oracle (rows={len(grows)})")
            n_skip += 1
            continue
        try:
            exp = con.sql(oracle[name])
            ecols, erows = [d[0] for d in exp.description], exp.fetchall()
        except Exception as e:
            print(f"  FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if sorted(gcols) != sorted(ecols):
            print(f"  FAIL {name}: schema {sorted(gcols)} != {sorted(ecols)}")
            n_fail += 1
            continue
        g, e = norm_rows(gcols, grows), norm_rows(ecols, erows)
        if g == e:
            print(f"  PASS {name} ({len(grows)} rows)")
            n_pass += 1
        else:
            print(f"  FAIL {name}: rows differ (spark={len(g)} duckdb={len(e)})")
            for i, (a, b) in enumerate(zip(g, e)):
                if a != b:
                    print(f"    first diff at {i}: spark={a} duckdb={b}")
                    break
            if len(g) != len(e):
                only_g = set(g) - set(e)
                only_e = set(e) - set(g)
                if only_g: print(f"    spark-only sample: {list(only_g)[:2]}")
                if only_e: print(f"    duckdb-only sample: {list(only_e)[:2]}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
