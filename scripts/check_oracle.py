#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare (builder-side tool
only — NOT part of the Scala library). Usage:
    python3 scripts/check_oracle.py /tmp/vout /root/testdata/sf0.01
Reads each <out>/<query>/ parquet + <out>/oracle_sql.json, runs the SQL in
DuckDB over the sf tables, sorts columns by name, and compares values
(exact for non-floats; reports both exact and tol-1e-9 for floats).
"""
import sys, json, glob, math, os
import duckdb

out_dir, sf_dir = sys.argv[1], sys.argv[2]
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        return v
    return v

def eq(a, b):
    # object-dtype parquet columns keep nested values as ndarrays even
    # after the outer .tolist(); normalize recursively
    if hasattr(a, "tolist"): a = a.tolist()
    if hasattr(b, "tolist"): b = b.tolist()
    if a is None and b is None:
        return True, True
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return a == b, a == b
        if math.isnan(fa) and math.isnan(fb):
            return True, True
        exact = fa == fb
        close = abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
        return exact, close
    if isinstance(a, list) or isinstance(b, list):
        if not isinstance(a, list) or not isinstance(b, list) or len(a) != len(b):
            return False, False
        ex = cl = True
        for x, y in zip(a, b):
            e, c = eq(x, y)
            ex &= e; cl &= c
        return ex, cl
    return a == b, a == b

results = {}
for name in sorted(os.listdir(out_dir)):
    qdir = os.path.join(out_dir, name)
    if not os.path.isdir(qdir):
        continue
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    files = glob.glob(f"{qdir}/*.parquet")
    if not files:
        results[name] = "NO-OUTPUT"
        continue
    got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
    if name not in oracle:
        results[name] = f"rows-only ({len(got)} rows)" + (" EMPTY!" if len(got) == 0 else "")
        continue
    try:
        want = con.execute(oracle[name]).fetchdf()
    except Exception as exn:
        results[name] = f"ORACLE-SQL-ERROR: {exn}"
        continue
    gcols, wcols = sorted(got.columns), sorted(want.columns)
    if gcols != wcols:
        results[name] = f"SCHEMA-MISMATCH got={gcols} want={wcols}"
        continue
    if len(got) != len(want):
        results[name] = f"ROWCOUNT got={len(got)} want={len(want)}"
        continue
    got = got[gcols]; want = want[wcols]
    n_exact = n_close = 0
    bad = None
    total = 0
    for i in range(len(got)):
        for c in gcols:
            a = got[c].iloc[i]
            b = want[c].iloc[i]
            if hasattr(a, "item") and not isinstance(a, (list,)):
                try: a = a.item()
                except Exception: pass
            if hasattr(b, "item") and not isinstance(b, (list,)):
                try: b = b.item()
                except Exception: pass
            if hasattr(a, "tolist"): a = a.tolist()
            if hasattr(b, "tolist"): b = b.tolist()
            e, cl = eq(a, b)
            total += 1
            n_exact += e; n_close += cl
            if not cl and bad is None:
                bad = (i, c, a, b)
    if n_close == total and n_exact == total:
        results[name] = f"OK exact ({len(got)} rows)"
    elif n_close == total:
        results[name] = f"OK close, {total-n_exact}/{total} inexact float cells"
    else:
        results[name] = f"MISMATCH {total-n_close}/{total} cells; first bad: {bad}"

w = max(len(k) for k in results)
fails = 0
for k, v in results.items():
    flag = "" if v.startswith("OK") or v.startswith("rows-only") else "  <<<<"
    if flag: fails += 1
    print(f"{k:<{w}}  {v}{flag}")
print(f"\n{len(results)} queries, {fails} failing")
