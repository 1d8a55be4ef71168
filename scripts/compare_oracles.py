#!/usr/bin/env python3
"""Dev tool: compare OLD vs NEW oracle SQL for the named queries. Each side runs
in its own fresh DuckDB connection; rows are sorted by all columns and compared
exactly. Usage: compare_oracles.py old.json new.json q_a q_b ..."""
import json, sys
import duckdb

old = json.load(open(sys.argv[1]))
new = json.load(open(sys.argv[2]))
names = sys.argv[3:] or sorted(n for n in new if new.get(n) != old.get(n))

SF = "/root/testdata/sf0.01"

def run(sql, mem="12GB"):
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{mem}'; SET threads=8;")
    for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    df = con.execute(sql).df()
    con.close()
    return df.reindex(sorted(df.columns), axis=1).sort_values(
        by=sorted(df.columns), ignore_index=True)

fail = 0
for name in names:
    if old.get(name) == new.get(name):
        print(f"[SAME-SQL] {name}")
        continue
    try:
        b = run(new[name])
    except Exception as e:
        print(f"[NEW-ERROR] {name}: {str(e).splitlines()[0][:140]}"); fail += 1; continue
    try:
        a = run(old[name])
    except Exception as e:
        print(f"[OLD-ERROR] {name}: {str(e).splitlines()[0][:140]} (new ran: {len(b)} rows)"); fail += 1; continue
    if list(a.columns) != list(b.columns):
        print(f"[SCHEMA] {name}: {list(a.columns)} vs {list(b.columns)}"); fail += 1; continue
    if len(a) != len(b):
        print(f"[ROWS] {name}: {len(a)} vs {len(b)}"); fail += 1; continue
    diff = (a != b) & ~(a.isna() & b.isna())
    nbad = int(diff.to_numpy().sum())
    if nbad:
        print(f"[DIFF] {name}: {nbad} cells")
        cols = [c for c in a.columns if diff[c].any()]
        idx = diff.any(axis=1)
        print(a.loc[idx, cols].head(3)); print(b.loc[idx, cols].head(3))
        fail += 1
    else:
        print(f"[OK] {name} rows={len(a)}")
print(f"== fail={fail} ==")
sys.exit(1 if fail else 0)
