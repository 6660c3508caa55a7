#!/usr/bin/env python3
"""Local replay of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables, compare to the Spark dumps."""
import sys, json, glob
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok, bad = [], []
for name, sql in sorted(oracle.items()):
    try:
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        bad.append((name, f"oracle SQL error: {str(e)[:200]}"))
        continue
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        bad.append((name, "no spark dump"))
        continue
    sdf = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
    # driver semantics: sort columns by name, then compare value multisets
    o = odf.reindex(sorted(odf.columns), axis=1)
    s = sdf.reindex(sorted(sdf.columns), axis=1)
    if list(o.columns) != list(s.columns):
        bad.append((name, f"schema: oracle={list(o.columns)} spark={list(s.columns)}"))
        continue
    if len(o) != len(s):
        bad.append((name, f"rows: oracle={len(o)} spark={len(s)}"))
        continue
    o = o.sort_values(by=list(o.columns)).reset_index(drop=True)
    s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
    diff_cols = []
    for c in o.columns:
        oc, sc = o[c], s[c]
        try:
            eq = (oc == sc) | (oc.isna() & sc.isna())
        except Exception:
            eq = oc.astype(str) == sc.astype(str)
        if not eq.all():
            idx = (~eq).idxmax()
            diff_cols.append(f"{c}[row{idx}]: oracle={oc[idx]!r} spark={sc[idx]!r}")
    if diff_cols:
        bad.append((name, "; ".join(diff_cols[:3])))
    else:
        ok.append((name, len(o)))

for name, n in ok:
    print(f"PASS {name} ({n} rows)")
for name, why in bad:
    print(f"FAIL {name}: {why}")
print(f"\n{len(ok)} pass, {len(bad)} fail")
sys.exit(1 if bad else 0)
