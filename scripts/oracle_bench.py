#!/usr/bin/env python3
"""Time every oracle SQL entry in DuckDB and fail on budget overrun.

The driver's correctness gate runs each `SparkEntry.oracleSql` entry in
DuckDB; an exponentially slow oracle (the q113/q118/q125 CTE-inlining bug)
silently blows the gate's wall budget and empties the whole artifact
(CORRECTNESS_r09/r10). This script is the per-oracle budget guard: every
entry must complete within CAP seconds at the given scale factor. It is
invoked by OracleBudgetSpec from `sbt test`, so a slow oracle fails the
suite the day it is written.

Usage: python3 scripts/oracle_bench.py <sfDir> <oracleSqlJson> <capSeconds>
Exit 0 = all within budget; 1 = at least one overran (listed on stdout).
"""
import sys, os, json, time, threading
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_capped(con, sql, cap):
    done = {}

    def work():
        try:
            con.execute(sql).fetchall()
            done["ok"] = True
        except Exception as e:  # noqa: BLE001
            done["err"] = str(e)

    t = threading.Thread(target=work, daemon=True)
    t0 = time.monotonic()
    t.start()
    t.join(cap)
    if t.is_alive():
        con.interrupt()
        t.join(10)
        done.pop("ok", None)
        done["err"] = f"exceeded {cap:.1f}s cap"
    return done, time.monotonic() - t0


def main():
    sf_dir, oracle_json, cap = sys.argv[1], sys.argv[2], float(sys.argv[3])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(oracle_json) as f:
        oracle = json.load(f)

    over = []
    timings = []
    for name in sorted(oracle):
        res, dt = run_capped(con, oracle[name], cap)
        timings.append((name, dt))
        if "err" in res:
            over.append((name, dt, res["err"]))
    slow = sorted(timings, key=lambda kv: -kv[1])[:8]
    print("slowest: " + ", ".join(f"{k}={v:.2f}s" for k, v in slow))
    if over:
        for name, dt, err in over:
            print(f"OVER-BUDGET {name} ({dt:.2f}s): {err}")
        sys.exit(1)
    print(f"all {len(timings)} oracles within {cap:.1f}s at {sf_dir}")


if __name__ == "__main__":
    main()
