#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each query result parquet under <verifyOutDir>/<name>/, runs the
corresponding SQL from oracle_sql.json in DuckDB over the sfDir tables,
sorts columns by name, canonicalizes values, and hash-compares.

Two guards beyond value equality (added round 6 — the r5 driver artifact
had two rows that were value-identical but HASH-mismatched because the
oracle emitted HUGEINT where the engine emits BIGINT, and the old
str()-based canonicalization here masked the difference):

1. TYPE LINT over EVERY oracle in oracle_sql.json (not just the queries
   dumped this run): each DESCRIBEd result column type must be built
   from the allowed leaf set — no HUGEINT, no DECIMAL, no unsigned.
   The engine-side result parquet is linted the same way.
2. TYPED HASH: the per-column normalized type participates in the table
   hash, so a type-class difference fails locally even when every value
   prints identically.

NOT part of the shipped library (driver-side tooling only).
"""
import json, os, re, sys, math, hashlib

import duckdb

# Leaf types an oracle (or engine result) is allowed to emit. HUGEINT /
# DECIMAL / unsigned ints are deliberately absent: DuckDB's sum(BIGINT)
# promotes to HUGEINT, which the driver's hasher distinguishes from the
# engine's BIGINT even at equal values — every oracle must cast back.
ALLOWED_LEAF = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT",
    "DOUBLE", "FLOAT", "VARCHAR", "BOOLEAN",
    "DATE", "TIMESTAMP", "TIMESTAMP_NS", "TIMESTAMP WITH TIME ZONE",
    "BLOB",
}
# Structural words that may appear in composite type spellings.
STRUCTURAL = {"STRUCT", "MAP"}


def type_violations(type_str):
    """Return the set of disallowed leaf-type tokens in a DuckDB type
    string like 'STRUCT(a BIGINT, b HUGEINT[])' -> {'HUGEINT'}."""
    bad = set()
    # tokens: runs of uppercase letters/underscores (type words are
    # uppercase in DESCRIBE output; struct field names are not)
    for tok in re.findall(r"[A-Z_]{2,}", type_str):
        if tok in STRUCTURAL or tok in ALLOWED_LEAF:
            continue
        # allow the words of multi-word allowed types ('WITH TIME ZONE')
        if tok in {"WITH", "TIME", "ZONE"}:
            continue
        bad.add(tok)
    return bad


def norm_type(type_str):
    """Normalize a DuckDB type to the class the hash should see.
    Int widths collapse (parquet int32 vs int64 carry equal values);
    HUGEINT/DECIMAL deliberately do NOT collapse into INT — that is
    exactly the difference the driver's hasher sees."""
    t = re.sub(r"\s+", " ", type_str.strip().upper())
    t = re.sub(r"\b(TINYINT|SMALLINT|INTEGER|BIGINT)\b", "INT", t)
    t = re.sub(r"\b(FLOAT|DOUBLE)\b", "FP", t)
    t = re.sub(r"\bTIMESTAMP_NS\b", "TIMESTAMP", t)
    return t


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
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def table_hash(rows, cols, types):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = hashlib.md5()
    # schema signature first: column name + normalized type class
    sig = ",".join(f"{cols[i]}:{norm_type(types[i])}" for i in order)
    h.update(sig.encode())
    h.update(b"\n--\n")
    lines = sorted("\x01".join(canon(r[i]) for i in order) for r in rows)
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest(), len(lines), sig


def describe_types(con, sql):
    """[(col, type)] for an arbitrary SELECT via DESCRIBE."""
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return [(r[0], r[1]) for r in rows]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

    # --- Pass 1: type lint over EVERY oracle, dumped or not ---
    n_lint = 0
    for name in sorted(oracle):
        try:
            typed = describe_types(con, oracle[name])
        except Exception as e:
            print(f"LINTFAIL {name}: oracle does not DESCRIBE: {e}")
            n_lint += 1
            continue
        for col, ty in typed:
            bad = type_violations(ty)
            if bad:
                print(f"LINTFAIL {name}: column {col} has disallowed "
                      f"type {ty} (tokens: {sorted(bad)})")
                n_lint += 1
    if n_lint == 0:
        print(f"LINT ok: {len(oracle)} oracles, all result types allowed")

    # --- Pass 2: typed hash compare for the queries dumped this run ---
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        src = f"SELECT * FROM read_parquet('{d}/*.parquet')"
        try:
            got = con.execute(src)
            grows, gcols = got.fetchall(), [c[0] for c in got.description]
            gtypes = dict(describe_types(con, src))
        except Exception as e:
            print(f"FAIL {name}: cannot read result parquet: {e}")
            n_fail += 1
            continue
        for col, ty in gtypes.items():
            bad = type_violations(ty)
            if bad:
                print(f"LINTFAIL {name}: ENGINE column {col} has "
                      f"disallowed type {ty} (tokens: {sorted(bad)})")
                n_lint += 1
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows={len(grows)})")
            continue
        try:
            exp = con.execute(oracle[name])
            erows, ecols = exp.fetchall(), [c[0] for c in exp.description]
            etypes = dict(describe_types(con, oracle[name]))
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if sorted(gcols) != sorted(ecols):
            print(f"FAIL {name}: cols {sorted(gcols)} != {sorted(ecols)}")
            n_fail += 1
            continue
        gh, gn, gsig = table_hash(grows, gcols, [gtypes[c] for c in gcols])
        eh, en, esig = table_hash(erows, ecols, [etypes[c] for c in ecols])
        if gn != en:
            print(f"FAIL {name}: rowcount {gn} != {en}")
            n_fail += 1
        elif gh != eh:
            if gsig != esig:
                print(f"FAIL {name}: type signature mismatch:\n"
                      f"  engine {gsig}\n  oracle {esig}")
            else:
                print(f"FAIL {name}: hash mismatch over {gn} rows")
            n_fail += 1
        else:
            print(f"PASS {name} ({gn} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_lint} lint")
    return 1 if (n_fail or n_lint) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
