#!/usr/bin/env python3
"""Oracle output-type lint — build-time guard for the driver's client path.

Usage: python3 tools/lint_oracle_types.py <outDir> <sfDir>

Round-6 lesson: DuckDB types SUM(BIGINT) as HUGEINT; the driver's comparator
fetches through pandas/arrow, where HUGEINT becomes float64/decimal128, so a
value that fetchall() would return as `0` hashes as `0.0` and the query goes
driver-red even though rows/schema match and check.py (fetchall-based)
passes. This lint DESCRIBEs every oracle query and fails on:

  * any HUGEINT / UHUGEINT output column (always a bug — cast to BIGINT);
  * any DECIMAL output column whose matching Spark parquet column is not
    itself decimal (intended decimal-exact queries keep both sides decimal).
"""
import sys, os, json, glob
import duckdb


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    bad = 0
    for name in sorted(oracle):
        try:
            desc = con.execute(f"DESCRIBE {oracle[name]}").fetchall()
        except Exception as e:
            print(f"LINT {name}: DESCRIBE failed: {e}")
            bad += 1
            continue
        spark_types = {}
        pq = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if pq:
            st = con.execute(
                f"DESCRIBE SELECT * FROM read_parquet({pq!r})").fetchall()
            spark_types = {r[0]: str(r[1]).upper() for r in st}
        for row in desc:
            col, typ = row[0], str(row[1]).upper()
            if "HUGEINT" in typ:
                print(f"LINT {name}.{col}: oracle type {typ} — wrap the "
                      f"expression in CAST(... AS BIGINT); the driver's "
                      f"pandas/arrow fetch corrupts the value hash")
                bad += 1
            elif typ.startswith("DECIMAL") and spark_types and \
                    not spark_types.get(col, "").startswith("DECIMAL"):
                print(f"LINT {name}.{col}: oracle type {typ} but Spark wrote "
                      f"{spark_types.get(col, '<missing>')} — align the types")
                bad += 1
    if bad:
        print(f"== oracle type lint: {bad} offending column(s) ==")
        sys.exit(1)
    print(f"== oracle type lint: {len(oracle)} queries clean ==")


main()
