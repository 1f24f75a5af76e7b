#!/usr/bin/env python3
"""Measured DuckDB denominator for the bench ratio (r11 judge item 8).

Usage: python3 tools/baseline_probe.py <sfDir> [itersPerQuery]

Runs every oracle SQL twin from SparkEntry.oracleSql (via a Verify
output's oracle_sql.json, or the committed copy) in DuckDB against the
harness parquet tables and records the MIN wall-clock seconds per query
(same discipline as graft.Bench: min-of-iters in a shared process).
Writes docs/bench/duckdb_baseline.json:

  {"sf": ..., "iters": N, "threads": T, "queries": {name: sec, ...},
   "total": S, "note": ...}

The bench artifact's `oracle_covered_total` (Spark's subtotal over
oracle-covered queries) divided by this file's `total` is the
"vs single-node baseline" ratio — both sides measured on the same box
at the same scale factor. DuckDB is driver-side tooling only; the
engine itself never depends on it.
"""
import sys, json, time, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    # oracle set: explicit 3rd arg wins; otherwise the known drop spots.
    # ALWAYS print the query count — an r15 session was silently measured
    # against a stale 225-query file left at the fixed /tmp path.
    oracle_path = sys.argv[3] if len(sys.argv) > 3 else None
    if oracle_path is None:
        for cand in ["/tmp/verify_sf001/oracle_sql.json", "docs/bench/oracle_sql.json"]:
            if os.path.exists(cand):
                oracle_path = cand
                break
    if oracle_path is None:
        sys.exit("no oracle_sql.json found — run graft.Verify first")
    oracles = json.load(open(oracle_path))
    print(f"[baseline] oracle file: {oracle_path} ({len(oracles)} queries)",
          file=sys.stderr)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    threads = con.execute("SELECT current_setting('threads')").fetchone()[0]
    results = {}
    for name in sorted(oracles):
        times = []
        for _ in range(max(1, iters)):
            t0 = time.perf_counter()
            try:
                con.execute(oracles[name]).fetchall()
            except Exception as e:
                print(f"ERR {name}: {e}")
                times = None
                break
            times.append(time.perf_counter() - t0)
        if times:
            results[name] = round(min(times), 6)
            print(f"{name}: {results[name]:.3f}s")
    out = {
        "sf": sf_dir,
        "iters": iters,
        "threads": int(threads),
        "queries": results,
        "total": round(sum(results.values()), 3),
        "note": ("measured DuckDB wall-clock per oracle twin, min of iters, "
                 "same box/scale as BENCH: the denominator for the bench "
                 "line's oracle_covered_total ratio. Oracle SQL replicates "
                 "the engine's exact semantics (rounding contracts, verdict "
                 "twins), so some queries cost MORE here than an idiomatic "
                 "DuckDB query would — this is a parity denominator, not a "
                 "DuckDB best-case."),
    }
    os.makedirs("docs/bench", exist_ok=True)
    with open("docs/bench/duckdb_baseline.json", "w") as f:
        json.dump(out, f)
    print(json.dumps({k: out[k] for k in ("sf", "iters", "threads", "total")}))


if __name__ == "__main__":
    main()
