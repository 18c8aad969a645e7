#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run Verify's parquet
dumps against DuckDB executing oracle_sql.json over the same testdata.
Compares row count, column-name set, and a hash of values with columns
sorted by name and rows sorted by all columns."""
import sys, json, glob
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        got = con.execute(f"SELECT * FROM '{files[0]}'").fetchdf()
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    if gcols != ecols:
        print(f"FAIL {name}: cols {gcols} vs {ecols}"); fails += 1; continue
    g = got[gcols].sort_values(gcols).reset_index(drop=True)
    e = exp[ecols].sort_values(ecols).reset_index(drop=True)
    if len(g) != len(e):
        print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); fails += 1; continue
    # normalize dtypes to str for hash-style compare
    gs = g.astype(str); es = e.astype(str)
    if not gs.equals(es):
        diff = (gs != es).any(axis=1)
        print(f"FAIL {name}: {diff.sum()} differing rows of {len(g)}")
        print("  spark:", g[diff].head(3).to_dict("records"))
        print("  duck :", e[diff].head(3).to_dict("records"))
        fails += 1; continue
    print(f"OK   {name}: {len(g)} rows")
print("ALL OK" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
