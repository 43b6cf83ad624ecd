#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <outDir> <sfDir> [query ...]

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB with the corpus tables
registered as views, and compares: column names (sorted), row count, and a
hash over all values with rows sorted canonically. This is a dev-loop tool
only — the real gate is driver-side.
"""
import sys, os, json, glob, hashlib
import duckdb

def canon(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        return repr(round(v, 9))
    return str(v)

def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        # corpus tables are single files; DERIVED corpora (EmbCorpus) write
        # Spark directories — glob the parts in that case
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        pq = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not pq:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.execute(f"SELECT * FROM read_parquet({pq!r})")
            gcols = [d[0] for d in got.description]
            grows = got.fetchall()
            exp = con.execute(oracle[name])
            ecols = [d[0] for d in exp.description]
            erows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if sorted(gcols) != sorted(ecols):
            print(f"FAIL {name}: cols spark={sorted(gcols)} oracle={sorted(ecols)}")
            n_fail += 1
            continue
        if len(grows) != len(erows):
            print(f"FAIL {name}: rows spark={len(grows)} oracle={len(erows)}")
            n_fail += 1
            continue
        hg, he = table_hash(gcols, grows), table_hash(ecols, erows)
        if hg != he:
            print(f"FAIL {name}: hash mismatch ({len(grows)} rows)")
            order = sorted(range(len(gcols)), key=lambda i: gcols[i])
            gs = sorted("\x01".join(canon(r[i]) for i in order) for r in grows)
            es = sorted("\x01".join(canon(r[i]) for i in order) for r in erows)
            shown = 0
            for a, b in zip(gs, es):
                if a != b and shown < 3:
                    print(f"  spark:  {a[:200]}")
                    print(f"  oracle: {b[:200]}")
                    shown += 1
            n_fail += 1
        else:
            print(f"PASS {name} ({len(grows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

main()
