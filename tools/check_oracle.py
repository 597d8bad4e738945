#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: read each
outDir/<name>.parquet produced by graft.Verify, run the matching
oracle_sql.json query in DuckDB over the same sf parquet tables, and
compare row count, schema (sorted column names) and a value hash.
Usage: check_oracle.py <sfDir> <outDir>
"""
import json, sys, os, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize cell values: floats rounded-ish repr, bytes→hex, lists→tuple
    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, float):
            return repr(round(v, 6))
        if isinstance(v, bytes):
            return v.hex()
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)
    rows = sorted("|".join(cell(v) for v in row) for row in df.itertuples(index=False, name=None))
    import hashlib
    return hashlib.md5("\n".join(rows).encode()).hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        got = pd.read_parquet(os.path.join(out_dir, name))
        if name not in oracle:
            results[name] = {"status": "rows_only", "rows": len(got)}
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = {"status": "ORACLE_ERROR", "error": str(e)[:300]}
            continue
        schema_ok = sorted(got.columns) == sorted(exp.columns)
        rows_ok = len(got) == len(exp)
        hash_ok = schema_ok and rows_ok and canon(got) == canon(exp)
        status = "OK" if hash_ok else "MISMATCH"
        results[name] = {"status": status, "rows": len(got), "oracle_rows": len(exp),
                         "schema_ok": schema_ok,
                         "cols": list(sorted(got.columns)) if not schema_ok else None,
                         "oracle_cols": list(sorted(exp.columns)) if not schema_ok else None}
    n_ok = sum(1 for r in results.values() if r["status"] == "OK")
    for name, r in sorted(results.items()):
        line = f"{r['status']:13s} {name}"
        if r["status"] == "MISMATCH":
            line += f" rows={r['rows']} vs {r['oracle_rows']} schema_ok={r['schema_ok']}"
            if r["cols"]:
                line += f"\n  got    cols: {r['cols']}\n  oracle cols: {r['oracle_cols']}"
        if r["status"] == "ORACLE_ERROR":
            line += " " + r["error"]
        print(line)
    print(f"\n{n_ok}/{len([n for n in names if n in oracle])} oracle-matched, "
          f"{len(names)} total queries")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
