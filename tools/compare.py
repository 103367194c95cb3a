#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run DuckDB on
SparkEntry.oracleSql and compare against the Verify parquet dumps.
Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [q1,q2,...]
(the optional third arg restricts the compare to those query names —
matches a targeted `graft.Verify ... q1,q2` dump)
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return v

def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracles = {k: v for k, v in oracles.items() if k in only}
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            exp = con.execute(sql).fetch_df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            got = duckdb.connect().execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetch_df()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        exp = exp[sorted(exp.columns)]
        got = got[sorted(got.columns)]
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
            continue
        mismatch = None
        ev = exp.values.tolist()
        gv = got.values.tolist()
        for i, (er, gr) in enumerate(zip(ev, gv)):
            for c, (a, b) in enumerate(zip(er, gr)):
                if norm(a) != norm(b):
                    mismatch = (i, exp.columns[c], a, b)
                    break
            if mismatch:
                break
        if mismatch:
            i, cname, a, b = mismatch
            print(f"FAIL {name}: row {i} col {cname}: oracle={a!r} spark={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(exp)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    subset = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], subset))
