#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Runs DuckDB oracle SQL against the same parquet tables and compares with the
parquet dumps produced by `graft.Verify`. Columns are sorted by name before
comparison (mirroring the driver); rows are compared as sorted multisets.

Each oracle runs under a wall-clock cap (ORACLE_CAP_S, default 30 s) with
per-query timing printed, so an exponentially slow oracle (the q113/q118/q125
CTE-inlining bug that emptied CORRECTNESS_r09/r10) fails loudly here instead
of silently hanging the driver's gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, os, json, math, time, threading
import duckdb
import pyarrow.parquet as pq

ORACLE_CAP_S = float(os.environ.get("ORACLE_CAP_S", "30"))


def run_oracle(con, sql, cap):
    """Run one oracle under a wall cap; interrupt DuckDB on overrun."""
    result = {}

    def work():
        try:
            result["table"] = con.execute(sql).fetch_arrow_table()
        except Exception as e:  # noqa: BLE001 - reported per-query
            result["err"] = e

    t = threading.Thread(target=work, daemon=True)
    t0 = time.monotonic()
    t.start()
    t.join(cap)
    if t.is_alive():
        con.interrupt()
        t.join(10)
        result.pop("table", None)
        result["err"] = RuntimeError(f"oracle exceeded {cap:.0f}s wall cap")
    return result, time.monotonic() - t0

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    return v


def rows_of(names, cols):
    order = sorted(range(len(names)), key=lambda i: names[i])
    data = [cols[i] for i in order]
    return sorted(zip(*[[canon(v) for v in c] for c in data]),
                  key=lambda r: tuple((x is None, str(x)) for x in r)), \
           [names[i] for i in order]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    n_pass = n_fail = n_skip = 0
    timings = {}
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    for name in names:
        if only and name not in only:
            continue
        got_t = pq.read_table(f"{out_dir}/{name}")
        if name not in oracle:
            print(f"  SKIP {name}: rows-only ({got_t.num_rows} rows)")
            n_skip += 1
            continue
        res, dt = run_oracle(con, oracle[name], ORACLE_CAP_S)
        timings[name] = dt
        if "err" in res:
            print(f"  FAIL {name}: oracle SQL error ({dt:.2f}s): {res['err']}")
            n_fail += 1
            continue
        exp = res["table"]
        got_rows, got_cols = rows_of(got_t.column_names,
                                     [c.to_pylist() for c in got_t.columns])
        exp_rows, exp_cols = rows_of(exp.column_names,
                                     [c.to_pylist() for c in exp.columns])
        if got_cols != exp_cols:
            print(f"  FAIL {name}: columns {got_cols} != {exp_cols}")
            n_fail += 1
            continue
        # The driver's hash compare is TYPE-FAMILY-sensitive: integer widths
        # are interchangeable (int32 Spark vs int64 DuckDB passed in r1) but
        # a DuckDB HUGEINT sum arrives as decimal128 and FAILS against Spark
        # int64 even when values match (q33/q37 in r1). Mirror that: compare
        # type families, where decimal is its own family.
        def family(t):
            import pyarrow.types as pt
            if pt.is_integer(t):
                return "int"
            if pt.is_floating(t):
                return "float"
            # string vs large_string and timestamp unit/tz vary by
            # DuckDB/pyarrow version; values are what the row compare checks
            if pt.is_string(t) or pt.is_large_string(t):
                return "str"
            if pt.is_timestamp(t):
                return "ts"
            if pt.is_boolean(t):
                return "bool"
            if pt.is_list(t) or pt.is_large_list(t):
                return ("list", family(t.value_type))
            return str(t)
        got_types = {f.name: f.type for f in got_t.schema}
        exp_types = {f.name: f.type for f in exp.schema}
        type_diff = [(c, str(got_types[c]), str(exp_types[c])) for c in got_cols
                     if family(got_types[c]) != family(exp_types[c])]
        if type_diff:
            print(f"  FAIL {name}: column type-family mismatch {type_diff}")
            n_fail += 1
            continue
        if len(got_rows) != len(exp_rows):
            print(f"  FAIL {name}: rowcount {len(got_rows)} != {len(exp_rows)}")
            n_fail += 1
            continue
        bad = [(i, g, e) for i, (g, e) in enumerate(zip(got_rows, exp_rows)) if g != e]
        if bad:
            i, g, e = bad[0]
            print(f"  FAIL {name}: {len(bad)}/{len(got_rows)} rows differ; first @{i}:")
            print(f"    cols: {got_cols}")
            print(f"    got:  {g}")
            print(f"    exp:  {e}")
            n_fail += 1
        else:
            print(f"  PASS {name} ({len(got_rows)} rows, oracle {dt:.2f}s)")
            n_pass += 1
    slow = sorted(timings.items(), key=lambda kv: -kv[1])[:5]
    print("== slowest oracles: " +
          ", ".join(f"{k}={v:.2f}s" for k, v in slow) + " ==")
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} rows-only ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
