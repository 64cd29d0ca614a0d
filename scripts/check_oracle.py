#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness compare.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify: load the parquet result, run the
oracle SQL in DuckDB over the same sfDir tables, sort columns by name,
and compare row count, schema, and a value hash. Queries without oracle
SQL get a rows-only report.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)

def value_hash(df: pd.DataFrame) -> str:
    # Stringify values raw (no float reformatting) to mirror the driver's
    # compare: a DuckDB HUGEINT that pandas coerces to float64 must FAIL
    # here ("7949.0" vs "7949"), not be masked by %.6g formatting.
    import hashlib
    h = hashlib.md5()
    for row in df.itertuples(index=False):
        for v in row:
            h.update(str(v).encode())
        h.update(b"\n")
    return h.hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # production layout: a directory of part files per table
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}/**/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(os.path.basename(d) for d in glob.glob(f"{out_dir}/*")
                   if os.path.isdir(d))
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISS  {name}: no parquet output"); n_fail += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        if name not in oracle:
            status = "ROWS " if len(got) > 0 else "EMPTY"
            print(f"{status} {name}: rows={len(got)} (no oracle)")
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error {e}"); n_fail += 1; continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL  {name}: cols {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1; continue
        if len(g) != len(e):
            print(f"FAIL  {name}: rows {len(g)} vs {len(e)}"); n_fail += 1; continue
        hg, he = value_hash(g), value_hash(e)
        if hg != he:
            print(f"FAIL  {name}: hash mismatch")
            diff = (g.astype(str) != e.astype(str))
            bad = diff.any(axis=1)
            print("  spark:", g[bad].head(3).to_dict("records"))
            print("  duck :", e[bad].head(3).to_dict("records"))
            n_fail += 1; continue
        print(f"PASS  {name}: rows={len(g)}"); n_pass += 1
    inv = f"{out_dir}/invariants.json"
    if os.path.exists(inv):
        print("invariants:", json.load(open(inv)))
    print(f"\n{n_pass} pass, {n_fail} fail, {len(names)} total")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
