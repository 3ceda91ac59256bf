#!/usr/bin/env python3
"""Measure the DuckDB oracle's runtime per query for comparison with
graft's Bench output. Dev tool only (driver-side python).

Usage: python3 tools/bench_duckdb.py <sfDir> <oracle_sql.json> [bench.json] [out.json]

When out.json is given, writes the per-query DuckDB seconds plus the
shared-set totals/ratio as a JSON artifact (BENCH_DUCKDB_r{N}.json) so
the engine-vs-engine comparison is measured each round, not carried
forward.
"""
import sys, json, time
import duckdb

def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    bench = {}
    if len(sys.argv) > 3:
        bench = json.load(open(sys.argv[3])).get("queries", {})
    oracle = json.load(open(oracle_path))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    rows = []
    for name, sql in sorted(oracle.items()):
        try:
            con.execute(sql).fetchall()  # warm
            t0 = time.time()
            con.execute(sql).fetchall()
            dt = time.time() - t0
        except Exception as e:
            dt = -1.0
        rows.append((name, dt, bench.get(name)))
    total_d = sum(d for _, d, _ in rows if d >= 0)
    total_s = sum(s for _, _, s in rows if s is not None)
    print(f"{'query':28s} {'duckdb_s':>9s} {'graft_s':>9s} {'ratio':>7s}")
    for name, d, s in rows:
        r = f"{s/d:7.1f}" if (s is not None and d > 0) else "      -"
        ss = f"{s:9.3f}" if s is not None else "        -"
        print(f"{name:28s} {d:9.3f} {ss} {r}")
    print(f"{'TOTAL':28s} {total_d:9.3f} {total_s:9.3f} "
          f"{(total_s/total_d if total_d else 0):7.1f}")
    if len(sys.argv) > 4:
        shared = [(n, d, s) for n, d, s in rows if d >= 0 and s is not None]
        out = {
            "sf_dir": sf_dir,
            "queries": {n: round(d, 4) for n, d, _ in rows if d >= 0},
            "failed": [n for n, d, _ in rows if d < 0],
            "shared_set": {
                "n_queries": len(shared),
                "duckdb_s": round(sum(d for _, d, _ in shared), 3),
                "graft_s": round(sum(s for _, _, s in shared), 3),
                # graft time / duckdb time over the identical SQL set:
                # < 1 means graft is faster in aggregate
                "ratio_graft_over_duckdb": round(
                    sum(s for _, _, s in shared) /
                    max(sum(d for _, d, _ in shared), 1e-9), 3),
            },
        }
        with open(sys.argv[4], "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {sys.argv[4]}")

if __name__ == "__main__":
    main()
