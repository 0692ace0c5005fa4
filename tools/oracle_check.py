#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each query result parquet under <verifyOutDir>/<name>/, runs the
corresponding SQL from oracle_sql.json in DuckDB over the sfDir tables,
sorts columns by name, canonicalizes values, and hash-compares.
NOT part of the shipped library (driver-side tooling only).
"""
import json, os, sys, math, hashlib

import duckdb


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # driver-style float canonicalization: round to tolerate 1-ulp drift
        return f"{v:.10g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest(), len(lines)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{d}/*.parquet')")
            grows, gcols = got.fetchall(), [c[0] for c in got.description]
        except Exception as e:
            print(f"FAIL {name}: cannot read result parquet: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows={len(grows)})")
            continue
        try:
            exp = con.execute(oracle[name])
            erows, ecols = exp.fetchall(), [c[0] for c in exp.description]
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if sorted(gcols) != sorted(ecols):
            print(f"FAIL {name}: cols {sorted(gcols)} != {sorted(ecols)}")
            n_fail += 1
            continue
        gh, gn = table_hash(grows, gcols)
        eh, en = table_hash(erows, ecols)
        if gn != en:
            print(f"FAIL {name}: rowcount {gn} != {en}")
            n_fail += 1
        elif gh != eh:
            print(f"FAIL {name}: hash mismatch over {gn} rows")
            n_fail += 1
        else:
            print(f"PASS {name} ({gn} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
