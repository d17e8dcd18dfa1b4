#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over views of the same
testdata parquet, sorts columns by name + rows by all values, and compares
cell-by-cell (exact for ints/strings; floats must match to 1e-9 rel; reports
first diffs). Dev-only tool — not part of the shipped library.
"""
import json, math, sys, os
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(rows, cols, types):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in idx))
    def key(t):
        return tuple((v is None, str(v)) for v in t)
    return sorted(cols), sorted(out, key=key), [str(types[i]) for i in idx]

def cell_eq(a, b):
    if a is None and b is None: return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb): return True
        return fa == fb or abs(fa-fb) <= 1e-9*max(abs(fa), abs(fb), 1.0)
    if type(a) is not type(b):
        return str(a) == str(b)
    return a == b

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    # skip harness-internal dirs (e.g. _expected, the differential
    # expected-parquet store the oracles themselves read)
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d))
                   and not d.startswith("_"))
    n_pass = n_fail = 0
    for name in names:
        got_rel = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        g_cols, g_rows, g_types = canon(got_rel.fetchall(), [c for c in got_rel.columns], got_rel.types)
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(g_rows)} rows")
            continue
        try:
            exp_rel = con.sql(oracles[name])
            e_cols, e_rows, e_types = canon(exp_rel.fetchall(), [c for c in exp_rel.columns], exp_rel.types)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e).splitlines()[0]}"); n_fail += 1; continue
        if g_cols != e_cols:
            print(f"FAIL {name}: columns {g_cols} != {e_cols}"); n_fail += 1; continue
        # The driver's compare hashes typed values, so an oracle that emits
        # HUGEINT (int128) where Spark emits BIGINT fails there even when the
        # Python values are equal ints — hard-fail that class (r2 proved the
        # driver rejects it). Narrower width differences (INTEGER vs BIGINT)
        # and timestamp-zone representation differences are driver-tolerated;
        # warn only.
        huge = [(c, gt, et) for c, gt, et in zip(g_cols, g_types, e_types)
                if gt != et and ("HUGEINT" in gt or "HUGEINT" in et)]
        if huge:
            print(f"FAIL {name}: int128-width mismatch {huge}"); n_fail += 1; continue
        if g_types != e_types:
            print(f"WARN {name}: column types differ {list(zip(g_cols, g_types, e_types))}")
        if len(g_rows) != len(e_rows):
            print(f"FAIL {name}: rowcount {len(g_rows)} != {len(e_rows)}"); n_fail += 1; continue
        bad = None
        for i, (gr, er) in enumerate(zip(g_rows, e_rows)):
            for j, (gv, ev) in enumerate(zip(gr, er)):
                if not cell_eq(gv, ev):
                    bad = (i, g_cols[j], gv, ev); break
            if bad: break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: got {bad[2]!r} exp {bad[3]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g_rows)} rows)")
            n_pass += 1
    missing = sorted(set(oracles) - set(names))
    for m in missing:
        print(f"MISSING OUTPUT for oracle {m}"); n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {len(names)} outputs ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
