#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only, not part of the
library): reads Verify output parquet + oracle_sql.json, runs each oracle in DuckDB
with the sf tables registered as views, compares sorted-column sorted-row values."""
import json, math, os, sys
import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
# Driver-fidelity mode: GRAFT_CHECK_MEMLIMIT=2GB GRAFT_CHECK_NO_RETRY=1 replicates
# the round driver's harness exactly (one connection, sequential, no OOM retry) —
# the shape that forfeited 60 round-3 rows when one oracle fragmented the allocator.
MEMLIMIT = os.environ.get("GRAFT_CHECK_MEMLIMIT", "60GB")
NO_RETRY = os.environ.get("GRAFT_CHECK_NO_RETRY", "") == "1"

def fresh_con():
    # this box caps vm.max_map_count at 65530; high default thread counts make
    # duckdb's allocator mmap-fail ("Out of Memory" at tiny block sizes) long
    # before real memory runs out
    c = duckdb.connect()
    c.execute(f"SET memory_limit='{MEMLIMIT}'; SET threads=8; SET preserve_insertion_order=false;")
    for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c

con = fresh_con()

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    try:
        got = con.execute(f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')").df()
    except Exception as e:
        print(f"[MISSING-RESULT] {name}: {e}"); fail += 1; continue
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        if "Out of Memory" in str(e) and not NO_RETRY:
            # mmap-cap allocator fragmentation after ~170 sequential queries:
            # a fresh connection resets the block allocator; the query itself fits
            try:
                con.close(); con = fresh_con()
                exp = con.execute(sql).df()
            except Exception as e2:
                print(f"[ORACLE-ERROR] {name}: {e2}"); fail += 1; continue
        else:
            print(f"[ORACLE-ERROR] {name}: {e}"); fail += 1; continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f"[SCHEMA-MISMATCH] {name}: got {list(got.columns)} vs exp {list(exp.columns)}"); fail += 1; continue
    # Driver-hash fidelity: the driver's hash renders values, so an int64 column on
    # one side vs a float64 (e.g. DuckDB HUGEINT widened sum -> pandas float) on the
    # other hashes 832 != 832.0 even when every cell is value-equal. int32-vs-int64
    # is tolerated (driver demonstrably passes it); int-vs-float is lethal — flag it
    # here even if the value compare below would pass.
    dtype_bad = []
    for c in got.columns:
        gk, ek = got[c].dtype.kind, exp[c].dtype.kind
        if (gk in "iu" and ek == "f") or (gk == "f" and ek in "iu"):
            dtype_bad.append(f"{c}: {got[c].dtype} vs {exp[c].dtype}")
    if dtype_bad:
        print(f"[DTYPE-MISMATCH] {name}: " + "; ".join(dtype_bad)); fail += 1; continue
    if len(got) != len(exp):
        print(f"[ROWCOUNT] {name}: got {len(got)} vs exp {len(exp)}"); fail += 1; continue
    gs = got.sort_values(by=list(got.columns), ignore_index=True)
    es = exp.sort_values(by=list(exp.columns), ignore_index=True)
    bad = 0
    for c in gs.columns:
        a, b = gs[c], es[c]
        for i in range(len(a)):
            x, y = a.iloc[i], b.iloc[i]
            if x is None and y is None: continue
            try:
                if isinstance(x, float) or isinstance(y, float):
                    fx, fy = float(x), float(y)
                    if math.isnan(fx) and math.isnan(fy): continue
                    if fx != fy:
                        bad += 1
                        if bad <= 3: print(f"  [{name}] col={c} row={i}: {x!r} != {y!r} (diff={fx-fy:g})")
                elif str(x) != str(y):
                    bad += 1
                    if bad <= 3: print(f"  [{name}] col={c} row={i}: {x!r} != {y!r}")
            except Exception:
                if str(x) != str(y):
                    bad += 1
                    if bad <= 3: print(f"  [{name}] col={c} row={i}: {x!r} != {y!r}")
    if bad:
        print(f"[VALUE-MISMATCH] {name}: {bad} cells differ"); fail += 1
    else:
        print(f"[OK] {name} rows={len(got)}"); ok += 1
print(f"== {ok} ok, {fail} fail ==")
sys.exit(1 if fail else 0)
