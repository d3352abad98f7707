#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 /tmp/oracle_check.py [sfdir outdir] [--only q1,q2]
Run graft.Verify first:  sbt -batch "runMain graft.Verify <sfdir> <outdir>"

For each query in <outdir>/oracle_sql.json: register every parquet in
<sfdir> as a view, run the oracle SQL in DuckDB, load the Spark result
from <outdir>/<name>.parquet, sort COLUMNS by name on both sides, and
exact-compare (order-sensitive rows; floats to 9 dp).
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

args = [a for a in sys.argv[1:] if not a.startswith("--")]
only = None
for a in sys.argv[1:]:
    if a.startswith("--only"):
        only = set(a.split("=", 1)[1].split(",")) if "=" in a else None
sfdir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
outdir = args[1] if len(args) > 1 else "/tmp/v"

con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.splitext(os.path.basename(p))[0]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle_sql = json.load(open(os.path.join(outdir, "oracle_sql.json")))

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cc = [cols[i] for i in order]
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = format(round(v, 9), ".9f")
                if v == "-0.000000000": v = "0.000000000"
            vals.append(str(v))
        out.append(tuple(vals))
    return cc, out

n_pass = n_fail = 0
fails = []
for name in sorted(oracle_sql):
    if only and name not in only:
        continue
    sql = oracle_sql[name]
    try:
        res = con.execute(sql)
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        tbl = pq.read_table(os.path.join(outdir, name))
        scols = tbl.column_names
        srows = [tuple(tbl.column(c)[i].as_py() for c in scols)
                 for i in range(tbl.num_rows)]
        oc, orr = canon(ocols, orows)
        sc, srr = canon(scols, srows)
        ok_schema = oc == sc
        ok_rows = len(orr) == len(srr)
        ok_hash = orr == srr
        if ok_schema and ok_rows and ok_hash:
            n_pass += 1
            print(f"PASS {name} ({len(srr)} rows)")
        else:
            n_fail += 1
            msg = f"FAIL {name}: schema={ok_schema} rows={ok_rows} ({len(srr)} vs {len(orr)}) hash={ok_hash}"
            print(msg)
            fails.append(name)
            if ok_schema and ok_rows and not ok_hash:
                for i, (a, b) in enumerate(zip(srr, orr)):
                    if a != b:
                        print(f"  first diff row {i}:\n    spark={a}\n    duck ={b}")
                        break
            elif not ok_schema:
                print(f"  spark cols={sc}\n  duck  cols={oc}")
    except Exception as e:
        n_fail += 1
        fails.append(name)
        print(f"FAIL {name}: err {e}")

print(f"\n{n_pass} pass / {n_fail} fail")
if fails:
    print("failing:", ",".join(fails))
    sys.exit(1)
