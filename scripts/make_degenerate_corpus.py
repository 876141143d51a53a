#!/usr/bin/env python3
"""Build a degenerate-document corpus for the ORACLE-side gate: the
engine-side no-crash blanket (DegenerateInputsSpec) cannot see
cross-ENGINE divergences — a query that returns different rows than
its DuckDB oracle on a NULL or empty doc "passes by corpus luck" on
the shipped testdata, which contains neither. This script augments a
testdata sf dir with exactly those shapes so check_oracle.py can
compare the two sides on them:

  - one NULL-text document  (doc_id = first_doc + 100000, n_chars 0)
  - one EMPTY-text document (doc_id = first_doc + 200000, n_chars 0)
  - one WHITESPACE-only document ('  \t ', doc_id + 300000)
  - two degenerate EVENTS: NULL event_type + NULL value + NULL props
    (event_id + 100000), and empty-string event_type with value 0
    (event_id + 200000) — both at the first event's ts/user so they
    land inside existing windows/sessions rather than extending the
    time range
  - one NULL-embedding row (vec_id + 100000), one EMPTY-array embedding
    (vec_id + 200000), and one all-ZERO vector of the corpus dimension
    (vec_id + 300000) — zero norm makes cosine 0/0: engines disagree on
    NaN ordering (Spark ranks NaN above every number in DESC sorts)

Everything else is copied as-is. Usage:

  python3 scripts/make_degenerate_corpus.py [srcSfDir] [outDir]
  # defaults: /root/testdata/sf0.001 -> /tmp/nulltest_sf
  sbt "runMain graft.Verify <outDir> /tmp/nullverify_out"   # or direct java
  python3 scripts/check_oracle.py /tmp/nullverify_out --sf <outDir>

Round-12 findings from this gate (engine and oracles since aligned BY
CONSTRUCTION, see the Catalog commit): q133 ANSI DIVIDE_BY_ZERO on an
empty doc's 0 BPE tokens (a single empty document would have aborted
the whole job at 100 TB); NULL-doc divergences in q24/q57/q109/q114/
q152/q153/q157/q164/q169/q172/q173, several caused by DuckDB's
null-skipping greatest()/list handling vs Spark's, one (q169) by the
ORACLE's three-valued CASE letting a NULL-gated doc fall through to
'kept'. q127's one-group residue (a 2058392.365 rounding knife-edge
where cross-engine float summation order split the 2-dp round) was
CLOSED late in round 12 by carrying monetary in exact integer cents —
integer-valued doubles below 2^53 sum exactly in any order — so the
standing expectation for this gate is now **167 pass / 0 fail**.
"""
import os
import shutil
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem"]


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/nulltest_sf"
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        shutil.copyfile(f"{src}/{t}.parquet", f"{out}/{t}.parquet")
    con = duckdb.connect()
    con.execute(f"""
    COPY (
      FROM read_parquet('{src}/documents.parquet')
      UNION ALL BY NAME
      (SELECT doc_id + 100000 AS doc_id, NULL AS text, lang, source,
              0 AS n_chars
       FROM read_parquet('{src}/documents.parquet')
       ORDER BY doc_id LIMIT 1)
      UNION ALL BY NAME
      (SELECT doc_id + 200000 AS doc_id, '' AS text, lang, source,
              0 AS n_chars
       FROM read_parquet('{src}/documents.parquet')
       ORDER BY doc_id LIMIT 1)
      UNION ALL BY NAME
      (SELECT doc_id + 300000 AS doc_id, '  \t ' AS text, lang, source,
              4 AS n_chars
       FROM read_parquet('{src}/documents.parquet')
       ORDER BY doc_id LIMIT 1)
    ) TO '{out}/documents.parquet' (FORMAT PARQUET)
    """)
    # events.parquet may carry TIMESTAMP(NANOS) — rebuild the column
    # as-is via DuckDB (it normalizes to TIMESTAMP, which the engine's
    # reader also accepts; TESTDATA.md documents all three encodings)
    con.execute(f"""
    COPY (
      FROM read_parquet('{src}/events.parquet')
      UNION ALL BY NAME
      (SELECT event_id + 100000 AS event_id, ts, user_id,
              NULL AS event_type, NULL AS value, NULL AS props
       FROM read_parquet('{src}/events.parquet')
       ORDER BY event_id LIMIT 1)
      UNION ALL BY NAME
      (SELECT event_id + 200000 AS event_id, ts, user_id,
              '' AS event_type, 0.0 AS value, props
       FROM read_parquet('{src}/events.parquet')
       ORDER BY event_id LIMIT 1)
    ) TO '{out}/events.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
    COPY (
      FROM read_parquet('{src}/embeddings.parquet')
      UNION ALL BY NAME
      (SELECT vec_id + 100000 AS vec_id, NULL AS embedding, label
       FROM read_parquet('{src}/embeddings.parquet')
       ORDER BY vec_id LIMIT 1)
      UNION ALL BY NAME
      (SELECT vec_id + 200000 AS vec_id, []::FLOAT[] AS embedding, label
       FROM read_parquet('{src}/embeddings.parquet')
       ORDER BY vec_id LIMIT 1)
      UNION ALL BY NAME
      (SELECT vec_id + 300000 AS vec_id,
              list_transform(embedding, x -> 0.0::FLOAT) AS embedding, label
       FROM read_parquet('{src}/embeddings.parquet')
       ORDER BY vec_id LIMIT 1)
    ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
    """)
    n, nt = con.execute(
        f"SELECT count(*), count(text) "
        f"FROM read_parquet('{out}/documents.parquet')").fetchone()
    ne, net = con.execute(
        f"SELECT count(*), count(event_type) "
        f"FROM read_parquet('{out}/events.parquet')").fetchone()
    nv, nve = con.execute(
        f"SELECT count(*), count(embedding) "
        f"FROM read_parquet('{out}/embeddings.parquet')").fetchone()
    print(f"wrote {out}: {n} documents ({n - nt} null-text, 1 empty-text), "
          f"{ne} events ({ne - net} null-type, 1 empty-type), "
          f"{nv} embeddings ({nv - nve} null)")


if __name__ == "__main__":
    main()
