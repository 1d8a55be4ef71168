#!/usr/bin/env python3
"""Driver-fidelity oracle profiler (dev tool): runs every oracle SQL sequentially in
ONE DuckDB connection, sorted by name, NO retry — the exact shape of the driver's
harness that OOM'd in round 3. Tracks wall time, RSS, and /proc/self/maps count per
query so the allocator-fragmenting oracles are identifiable. Exit 1 on any error."""
import json, os, resource, sys, time
import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
MEM = sys.argv[3] if len(sys.argv) > 3 else "2GB"
THREADS = sys.argv[4] if len(sys.argv) > 4 else None

con = duckdb.connect()
con.execute(f"SET memory_limit='{MEM}'")
if THREADS:
    con.execute(f"SET threads={THREADS}")
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

def maps_count():
    with open("/proc/self/maps") as f:
        return sum(1 for _ in f)

def rss_mb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
rows = []
fail = 0
for name, sql in sorted(oracle.items()):
    t0, m0 = time.time(), maps_count()
    try:
        n = len(con.execute(sql).fetchall())
        err = None
    except Exception as e:
        n, err = -1, str(e).split("\n")[0][:120]
        fail += 1
    dt, m1 = time.time() - t0, maps_count()
    rows.append((name, dt, m1 - m0, m1, n, err))
    print(f"{name:32s} {dt:7.2f}s maps+{m1-m0:5d} tot={m1:6d} rss={rss_mb():7.0f}MB rows={n}" + (f" ERR {err}" if err else ""), flush=True)

rows.sort(key=lambda r: -r[2])
print("\n== top map-growers ==")
for r in rows[:15]:
    print(f"{r[0]:32s} maps+{r[2]:5d}  {r[1]:6.2f}s")
rows.sort(key=lambda r: -r[1])
print("== slowest ==")
for r in rows[:15]:
    print(f"{r[0]:32s} {r[1]:7.2f}s")
print(f"== fail={fail} ==")
sys.exit(1 if fail else 0)
