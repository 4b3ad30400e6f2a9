#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare each
Verify-dumped parquet against its DuckDB oracle SQL over the same tables.
Usage: python3 tools/check.py <sfDir> <outDir>
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
# parallel-bucket runs (tools/check_buckets.sh) cap each instance's
# thread pool so N concurrent checks share the machine instead of
# thrashing it; absent = DuckDB's default (all cores)
if os.environ.get("GRAFT_CHECK_THREADS"):
    con.execute(f"SET threads TO {int(os.environ['GRAFT_CHECK_THREADS'])}")
# big-corpus gates (sf10): bound DuckDB's memory so heavy oracles spill
# to disk instead of getting OOM-killed mid-bucket; absent = default
if os.environ.get("GRAFT_CHECK_MEMLIMIT"):
    con.execute(f"SET memory_limit='{os.environ['GRAFT_CHECK_MEMLIMIT']}'")
    # per-process spill dir: concurrent bucket instances sharing one
    # temp_directory race on each other's spill files at cleanup
    con.execute(f"SET temp_directory='/tmp/duckdb_spill_{os.getpid()}'")
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    # driver testdata is one file per table; Spark-amplified corpora
    # (graft.ScaleUp) are directories of part files
    p = f"{sfdir}/{t}.parquet"
    if os.path.isdir(p):
        p = f"{p}/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = 0
for qdir in sorted(glob.glob(f"{outdir}/q*")):
    name = os.path.basename(qdir)
    files = glob.glob(f"{qdir}/*.parquet")
    if not files:
        print(f"{name}: NO OUTPUT"); fails += 1; continue
    got = pq.read_table(files[0]).to_pandas()
    if name not in oracle:
        print(f"{name}: rows-only ({len(got)} rows)"); continue
    try:
        exp = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR {str(e).splitlines()[0][:150]}")
        fails += 1; continue
    g, e = norm(got.copy()), norm(exp.copy())
    if list(g.columns) != list(e.columns):
        print(f"{name}: COLUMN MISMATCH spark={list(g.columns)} duck={list(e.columns)}")
        fails += 1; continue
    if len(g) != len(e):
        print(f"{name}: ROWCOUNT spark={len(g)} duck={len(e)}"); fails += 1; continue
    bad = []
    for c in g.columns:
        gv, ev = g[c], e[c]
        try:
            if gv.dtype != object and ev.dtype != object:
                eq = (gv.astype("float64").fillna(-1e308) == ev.astype("float64").fillna(-1e308))
            else:
                eq = gv.astype(str) == ev.astype(str)
            if not eq.all():
                i = int((~eq).idxmax())
                bad.append((c, str(gv.dtype), str(ev.dtype), i, gv[i], ev[i]))
        except Exception as ex:
            bad.append((c, str(gv.dtype), str(ev.dtype), -1, "cmp-error", str(ex)[:80]))
    # dtype check (schema-ish)
    dt = [(c, str(g[c].dtype), str(e[c].dtype)) for c in g.columns
          if str(g[c].dtype) != str(e[c].dtype)]
    if bad:
        print(f"{name}: VALUE MISMATCH {bad[:3]}"); fails += 1
    elif dt:
        print(f"{name}: ok-values DTYPE-DIFF {dt}")
    else:
        print(f"{name}: OK ({len(g)} rows)")
print("FAILS:", fails)
sys.exit(1 if fails else 0)
