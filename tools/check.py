#!/usr/bin/env python3
"""Dev-loop oracle check, mimicking the driver's CORRECTNESS gate.

Usage: python3 tools/check.py <outDir> <sfDir> [query ...]

Reads <outDir>/<name>/ parquet (written by graft.Verify), runs
<outDir>/oracle_sql.json entries in DuckDB over <sfDir> views, and
compares normalized sorted rows. Dev tool only — NOT part of the
shipped Scala library.
"""
import sys, json, math, glob
import duckdb

def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)

def rows_of(cur):
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in cur.fetchall():
        out.append(tuple(norm(row[i]) for i in order))
    return [cols[i] for i in order], sorted(out)

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output");  n_fail += 1;  continue
        try:
            ocols, orows = rows_of(con.execute(sql))
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}");  n_fail += 1;  continue
        scols, srows = rows_of(con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"))
        # dtype probe: the driver's hash is dtype-sensitive (BIGINT 123 vs
        # DOUBLE 123.0 hash-differ even when check.py's norm() agrees).
        otypes = dict((r[0], r[1]) for r in
                      con.execute(f"DESCRIBE ({sql})").fetchall())
        stypes = dict((r[0], r[1]) for r in con.execute(
            f"DESCRIBE SELECT * FROM "
            f"read_parquet('{out_dir}/{name}/*.parquet')").fetchall())
        def tclass(t):
            # HUGEINT is NOT benign: DuckDB's arrow export maps it to
            # decimal128, so the driver's dtype-sensitive hash diverges
            # from Spark BIGINT (broke q_duckdb_agg2/_exclude/
            # q_text_urls in round 9). UBIGINT (uint64) IS benign —
            # r09 proved it green in q_duckdb_dates3/funcs7/funcs8/json2.
            if t == "HUGEINT":
                return "int128"
            if t in ("TINYINT","SMALLINT","INTEGER","BIGINT",
                     "UTINYINT","USMALLINT","UINTEGER","UBIGINT"):
                return "int"
            if t in ("FLOAT","DOUBLE"):
                return "float"
            if t.startswith("DECIMAL"):
                return t  # scale matters: Decimal('2.50') != 2.5 rendering
            if t in ("JSON","VARCHAR") or t.startswith("ENUM"):
                # ENUM proved benign: q_duckdb_union (union_tag returns
                # ENUM('tag')) hash-passed vs Spark VARCHAR in r10 —
                # pandas renders both as str.
                return "str"
            return t
        # int-width skew (INTEGER vs BIGINT) is benign — the driver's
        # hash renders both as python int. Class skew (int vs float)
        # is what broke q_math_funcs in round 1.
        tdiff = [(c, otypes.get(c), stypes.get(c)) for c in otypes
                 if c in stypes and tclass(otypes[c]) != tclass(stypes[c])]
        if tdiff:
            # BLOCKING, not a WARN: the r9 HUGEINT and r10 ceil/floor
            # reds were both dtype-class skews that check.py warned
            # about and that shipped anyway. The driver's hash is
            # dtype-sensitive, so class skew == certain hash failure.
            print(f"FAIL {name}: dtype skew (driver hash WILL fail): {tdiff}")
            n_fail += 1
            continue
        if ocols != scols:
            print(f"FAIL {name}: cols spark={scols} oracle={ocols}")
            n_fail += 1
        elif orows != srows:
            diffs = [(a, b) for a, b in zip(srows, orows) if a != b]
            print(f"FAIL {name}: {len(srows)} vs {len(orows)} rows; "
                  f"first diffs: {diffs[:3]}"
                  f"{' (len mismatch)' if len(srows)!=len(orows) else ''}")
            if len(srows) != len(orows):
                print(f"  spark head: {srows[:2]}\n  oracle head: {orows[:2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(orows)} rows)");  n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
