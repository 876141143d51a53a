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
--scale-spellings  substitute the SCALE_SPELLINGS rewrites (equivalence
           proven at sf0.01, see the dict) for oracles whose catalog
           spelling is over budget at sf0.1.
--oracle-cache DIR  persist each successful oracle result (gzipped
           JSON keyed by query name, oracle-SQL md5, and sf dir) and,
           when a later run's oracle blows the budget, compare the
           engine dump against the CACHED result instead of skipping —
           the DuckDB recompute is a convenience, not the contract; the
           cache entry is itself a past successful recompute of the
           IDENTICAL SQL on the IDENTICAL tables, so the comparison is
           as strong, minus only oracle-side nondeterminism (none: the
           oracles are deterministic SQL). A changed oracle SQL or sf
           dir invalidates the entry (the md5/sf key mismatch).

Compare rule (mirrors the driver contract as documented in the builder
prompt): sort columns by name, sort rows, compare values with doubles
rounded to a tolerance-free canonical repr.
"""
import sys, os, json, subprocess, math, threading, gzip, hashlib
import duckdb

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# --scale-spellings: semantically-identical rewrites of oracle queries
# whose catalog spelling is over the wall budget at sf0.1. q67's pair
# stage is all-pairs O(n^2) in the catalog (the honest executable
# definition); here it is blocked on a shared shingle, which is
# EXACT-recall for the same reason the engine's candidate generators
# are: Jaccard >= 0.5 > 0 requires a nonempty shingle intersection, so
# every qualifying pair shares at least one posting and survives the
# block. Equivalence is not taken on faith: both spellings were run at
# sf0.01 and returned identical rows (476/476), and the component /
# survivor tail below is byte-identical to the catalog oracle's.
SCALE_SPELLINGS = {
    "q67_dedup_survivors": r"""WITH RECURSIVE
tk AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
sh AS (SELECT doc_id, list_distinct(list_transform(
         generate_series(1, len(tk) - 2),
         i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh FROM tk),
post AS (SELECT doc_id, unnest(sh) AS s FROM sh),
cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
         FROM post a JOIN post b ON a.s = b.s AND a.doc_id < b.doc_id),
pairs AS (SELECT c.da, c.db FROM cand c
          JOIN sh x ON x.doc_id = c.da JOIN sh y ON y.doc_id = c.db
          WHERE len(list_intersect(x.sh, y.sh))::DOUBLE /
                len(list_distinct(list_concat(x.sh, y.sh))) >= 0.5),
sym AS (SELECT da AS s, db AS d FROM pairs
        UNION SELECT db, da FROM pairs),
reach(s, d) AS (
  SELECT s, d FROM sym
  UNION
  SELECT r.s, e.d FROM reach r JOIN sym e ON r.d = e.s AND e.d <> r.s),
lab AS (SELECT n.s AS node, least(n.s, min(r.d)) AS component
        FROM (SELECT DISTINCT s FROM sym) n
        LEFT JOIN reach r ON r.s = n.s GROUP BY n.s)
SELECT d.doc_id, d.lang FROM documents d
WHERE d.doc_id NOT IN (SELECT node FROM lab WHERE node <> component)
ORDER BY d.doc_id""",
}


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


def cache_key(sql, sf_dir):
    return hashlib.md5((sql + "\n@" + os.path.abspath(sf_dir)).encode()).hexdigest()


def cache_load(cache_dir, name, sql, sf_dir):
    p = os.path.join(cache_dir, f"{name}.json.gz")
    if not os.path.exists(p):
        return None
    try:
        with gzip.open(p, "rt") as f:
            d = json.load(f)
    except Exception:
        return None
    if d.get("key") != cache_key(sql, sf_dir):
        return None  # oracle SQL or table dir changed — stale entry
    return d["cols"], [tuple(r) for r in d["rows"]]


def cache_store(cache_dir, name, sql, sf_dir, cols, rows):
    os.makedirs(cache_dir, exist_ok=True)
    p = os.path.join(cache_dir, f"{name}.json.gz")
    tmp = p + ".tmp"
    with gzip.open(tmp, "wt") as f:
        json.dump({"key": cache_key(sql, sf_dir), "sf": sf_dir,
                   "cols": cols, "rows": [list(r) for r in rows]}, f)
    os.replace(tmp, p)


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/tmp/verify_out"
    sf_dir = opt("--sf", SF_DIR)
    excluded = set(filter(None, opt("--exclude", "").split(",")))
    timeout = float(opt("--timeout", "0"))
    cache_dir = opt("--oracle-cache", "")
    if "--run" in sys.argv:
        subprocess.run(["sbt", "-batch", f'runMain graft.Verify {sf_dir} {out_dir}'],
                       check=True, capture_output=True, text=True)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if "--scale-spellings" in sys.argv:
        for name, sql in SCALE_SPELLINGS.items():
            if name in oracle:
                oracle[name] = sql
                print(f"INFO {name}: using the blocked scale spelling")
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
        def budget_blown():
            cached = cache_load(cache_dir, name, sql, sf_dir) if cache_dir else None
            if cached is not None:
                print(f"INFO {name}: oracle exceeded {timeout:.0f}s budget — "
                      "comparing against the cached oracle result")
            else:
                print(f"SKIP {name}: oracle exceeded {timeout:.0f}s budget")
            return cached
        try:
            ocols, orows = with_timeout(con, sql, timeout)
            if cache_dir:
                cache_store(cache_dir, name, sql, sf_dir, ocols, orows)
        except duckdb.InterruptException:
            cached = budget_blown()
            if cached is None:
                n_skip += 1
                continue
            ocols, orows = cached
        except Exception as e:
            if "INTERRUPT" in str(e).upper():
                cached = budget_blown()
                if cached is None:
                    n_skip += 1
                    continue
                ocols, orows = cached
            else:
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
