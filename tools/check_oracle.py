#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
in DuckDB over the testdata tables, load the engine's Verify parquet
output, and compare (columns sorted by name, rows in produced order).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import glob
import json
import math
import os
import sys

import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

# (query, column) pairs whose round(sum, 4) reaches ~1e11 at sf1: the
# 4th decimal is then the 16th significant digit — past double
# precision — so Spark's parallel and DuckDB's sequential summation
# legitimately land 1 ulp apart and the round can fall on different
# sides of the quantum (SCALE.md "Correctness at sf1"). For these
# pairs ONLY, floats compare with a last-rounded-decimal tolerance
# gated on a sub-double-precision RELATIVE difference, so it can never
# mask a real arithmetic error (any genuine bug is astronomically
# larger than 5e-15 relative). The set is the five sf1-observed
# columns plus check_salted_join, which computes the identical sum as
# check_bucketed_join through a different physical plan (different
# summation order — same ulp exposure, pass/fail there is a coin
# toss).
# Sketch-estimate columns: BELOW sketch capacity the estimate
# degenerates to the exact count and the tight compare binds (all gate
# scales); AT saturation (sf1: 200k parts vs k=32768) a KMV estimate
# legitimately differs from the oracle's exact count, bounded by the
# published 3/sqrt(k) = 1.66% error. A real sketch bug (the r6
# saturation cap reported 32768 for 200k — 84% off) fails loudly.
EST_TOL_COLS = {
    ("sketch_kmv_parts", "n_parts"): 3.0 / math.sqrt(32768),
}

def est_tolerated(name, c, a, b):
    tol = EST_TOL_COLS.get((name, c))
    if tol is None:
        return False
    try:
        a, b = float(a), float(b)
    except (TypeError, ValueError):
        return False
    return b != 0 and abs(a - b) / abs(b) <= tol

ULP_TOL_COLS = {
    ("check_bucketed_join", "total"),
    ("check_salted_join", "total"),
    ("cube_order_stats", "total"),
    ("histogram_totalprice", "total"),
    ("q19_disjunctive_filter", "revenue"),
    ("range_join_price_bands", "total"),
}

def ulp_tolerated(a, b):
    if not (isinstance(a, float) and isinstance(b, float)):
        return False
    if math.isnan(a) or math.isnan(b):
        return False
    d = abs(a - b)
    m = max(abs(a), abs(b))
    # Spark's parallel (tree) summation and DuckDB's sequential order
    # accumulate DIFFERENT float error over millions of rows: sf1
    # observed up to ~100 ulps apart (0.0015 at 7.3e10 over 1.5M rows,
    # rel 2.1e-14) — well within summation-order noise (bound ~n*eps),
    # and 4 orders of magnitude below one missing/extra row's
    # contribution (the smallest o_totalprice is ~900 → rel ~1e-8).
    # 1e-12 therefore tolerates reordering noise only; any genuine
    # arithmetic or row-count error still fails loudly (the +1
    # injection demo lands at rel 1.3e-11 and FAILS).
    return m > 0 and d / m <= 1e-12

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.17g}"
    return str(v)

fails, passes, rows_only = [], 0, 0
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        fails.append((name, "no engine output parquet"))
        continue
    eng = con.execute(f"SELECT * FROM '{d}/*.parquet'").fetchdf()
    if name not in oracle:
        rows_only += 1
        status = "rows-only"
        if len(eng) == 0:
            fails.append((name, "rows-only check: 0 rows"))
        else:
            print(f"  OK(rows-only) {name}: {len(eng)} rows")
        continue
    try:
        ora = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    ecols, ocols = sorted(eng.columns), sorted(ora.columns)
    if ecols != ocols:
        fails.append((name, f"schema mismatch: engine={ecols} oracle={ocols}"))
        continue
    if len(eng) != len(ora):
        fails.append((name, f"row count: engine={len(eng)} oracle={len(ora)}"))
        continue
    eng, ora = eng[ecols], ora[ocols]
    bad = None
    for i in range(len(eng)):
        for c in ecols:
            a, b = eng[c].iloc[i], ora[c].iloc[i]
            an, bn = (a is None or (isinstance(a, float) and math.isnan(a))), (
                b is None or (isinstance(b, float) and math.isnan(b)))
            if an and bn:
                continue
            if norm(a) != norm(b):
                if (name, c) in ULP_TOL_COLS and ulp_tolerated(a, b):
                    continue
                if est_tolerated(name, c, a, b):
                    continue
                bad = f"row {i} col {c}: engine={a!r} oracle={b!r}"
                break
        if bad:
            break
    if bad:
        fails.append((name, bad))
    else:
        passes += 1
        print(f"  OK {name}: {len(eng)} rows")

print(f"\n{passes} oracle-pass, {rows_only} rows-only, {len(fails)} FAIL")
for n, why in fails:
    print(f"  FAIL {n}: {why}")
sys.exit(1 if fails else 0)
