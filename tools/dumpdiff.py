#!/usr/bin/env python3
"""Double-dump determinism check: two independent Verify output dirs must
be VALUE-identical for every query (the standing rule at each inventory
growth step — catches partition-order-sensitive results, RNG leaks, and
unordered aggregates that happen to hash-match once).
Usage: python3 tools/dumpdiff.py <outDirA> <outDirB>
"""
import math
import os
import sys
import duckdb

def norm(v):
    # Recursive: array-typed parquet columns surface as numpy arrays,
    # whose != is elementwise (ambiguous truth value) — convert every
    # sequence cell to a tuple of normalized values so comparison is
    # scalar. numpy scalars normalize via item().
    if hasattr(v, "item") and not hasattr(v, "__len__"):
        v = v.item()
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    return v

def main(a, b):
    names = sorted(d for d in os.listdir(a)
                   if os.path.isdir(os.path.join(a, d)))
    n_pass = n_fail = 0
    for name in names:
        try:
            ra = duckdb.connect().execute(
                f"SELECT * FROM read_parquet('{a}/{name}/*.parquet')").fetch_df()
            rb = duckdb.connect().execute(
                f"SELECT * FROM read_parquet('{b}/{name}/*.parquet')").fetch_df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(ra.columns) != list(rb.columns) or len(ra) != len(rb):
            print(f"FAIL {name}: shape {ra.shape} != {rb.shape}")
            n_fail += 1
            continue
        va, vb = ra.values.tolist(), rb.values.tolist()
        bad = next(((i, c) for i, (x, y) in enumerate(zip(va, vb))
                    for c, (p, q) in enumerate(zip(x, y)) if norm(p) != norm(q)), None)
        if bad:
            i, c = bad
            print(f"FAIL {name}: row {i} col {ra.columns[c]}: {va[i][c]!r} != {vb[i][c]!r}")
            n_fail += 1
        else:
            n_pass += 1
    print(f"\n{n_pass} identical, {n_fail} differ")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
