#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify at
sf0.01, then compare each query's parquet dump against its DuckDB oracle.

Usage: python3 scripts/check_oracle.py [outDir]
         [--sf DIR] [--exclude q1,q2,...] [--timeout SECONDS]
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first, or pass --run)

--sf       oracle table directory (default sf0.01) — pass the sf0.1 dir
           to re-run the gate at 10x the driver's scale.
--exclude  comma-separated query names to skip (the all-pairs oracle
           twins whose DuckDB side is O(n^2)-hours at sf0.1).
--timeout  per-ORACLE-query wall budget; a blown budget records
           SKIP(timeout) instead of hanging the whole gate.

Compare rule (mirrors the driver contract as documented in the builder
prompt): sort columns by name, sort rows, compare values with doubles
rounded to a tolerance-free canonical repr.
"""
import sys, os, json, subprocess, math, threading
import duckdb

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def opt(flag, default):
    if flag in sys.argv:
        return sys.argv[sys.argv.index(flag) + 1]
    return default


def with_timeout(con, sql, seconds):
    """Run one oracle query with a wall budget; duckdb's interrupt()
    aborts the running statement from another thread.

    Each budgeted query runs on its OWN cursor: a timer that fires in
    the window after the statement completes but before the flag flips
    would otherwise interrupt the shared connection with nothing
    running, aborting the NEXT query (which the caller then
    misclassifies as a timeout). A stray interrupt on a per-query
    cursor hits only that dead cursor. The lock closes the residual
    close()-vs-interrupt() race on the cursor itself."""
    if not seconds:
        return frame_rows(con.sql(sql))
    cur = con.cursor()
    state = {"done": False}
    lock = threading.Lock()

    def fire():
        with lock:
            if not state["done"]:
                cur.interrupt()

    timer = threading.Timer(seconds, fire)
    timer.start()
    try:
        out = frame_rows(cur.sql(sql))
        return out
    finally:
        timer.cancel()
        with lock:
            state["done"] = True
            cur.close()


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0.0:
            return "0.0"  # collapse signed zero: -0.0 == 0.0 numerically
        return repr(v)
    return str(v)


def frame_rows(rel):
    df = rel.df()
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(canon(v) for v in row) for row in df.itertuples(index=False, name=None)]
    rows.sort()
    return cols, rows


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/tmp/verify_out"
    sf_dir = opt("--sf", SF_DIR)
    excluded = set(filter(None, opt("--exclude", "").split(",")))
    timeout = float(opt("--timeout", "0"))
    if "--run" in sys.argv:
        subprocess.run(["sbt", "-batch", f'runMain graft.Verify {sf_dir} {out_dir}'],
                       check=True, capture_output=True, text=True)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle):
        if name in excluded:
            print(f"SKIP {name}: excluded")
            n_skip += 1
            continue
        sql = oracle[name]
        pq = f"{out_dir}/{name}"
        if not os.path.isdir(pq):
            print(f"FAIL {name}: no spark output at {pq}")
            n_fail += 1
            continue
        try:
            scols, srows = frame_rows(con.sql(f"SELECT * FROM '{pq}/*.parquet'"))
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        try:
            ocols, orows = with_timeout(con, sql, timeout)
        except duckdb.InterruptException:
            print(f"SKIP {name}: oracle exceeded {timeout:.0f}s budget")
            n_skip += 1
            continue
        except Exception as e:
            if "INTERRUPT" in str(e).upper():
                print(f"SKIP {name}: oracle exceeded {timeout:.0f}s budget")
                n_skip += 1
                continue
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if scols != ocols:
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
            n_fail += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(srows, orows) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(srows)} row mismatches; first: spark={bad[0][0]} oracle={bad[0][1]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(srows)} rows)")
        n_pass += 1

    # rows-only queries (present as parquet but no oracle)
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d)
        if os.path.isdir(p) and d not in oracle:
            try:
                n = con.sql(f"SELECT count(*) FROM '{p}/*.parquet'").fetchone()[0]
                print(f"INFO {d}: rows-only, {n} rows")
            except Exception as e:
                print(f"WARN {d}: unreadable: {e}")

    print(f"\n{n_pass} pass / {n_fail} fail / {n_skip} skip")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
