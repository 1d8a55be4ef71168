#!/usr/bin/env python3
"""Profile ONE oracle query in a fresh process: wall, peak-maps, rss. Args: name [mem]."""
import json, resource, sys, time, threading
import duckdb
name = sys.argv[1]
mem = sys.argv[2] if len(sys.argv) > 2 else "2GB"
sql = json.load(open("/tmp/verify_out/oracle_sql.json"))[name]
con = duckdb.connect()
con.execute(f"SET memory_limit='{mem}'")
SF="/root/testdata/sf0.01"
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
peak = [0]
stop = [False]
def poll():
    while not stop[0]:
        try: peak[0] = max(peak[0], sum(1 for _ in open("/proc/self/maps")))
        except Exception: pass
        time.sleep(0.05)
th = threading.Thread(target=poll, daemon=True); th.start()
t0 = time.time()
try:
    n = len(con.execute(sql).fetchall()); err = ""
except Exception as e:
    n, err = -1, str(e).split("\n")[0][:100]
stop[0] = True; th.join()
end_maps = sum(1 for _ in open("/proc/self/maps"))
print(f"{name:28s} {time.time()-t0:8.2f}s peakmaps={peak[0]:6d} endmaps={end_maps:6d} rss={resource.getrusage(resource.RUSAGE_SELF).ru_maxrss//1024:6d}MB rows={n} {err}")
