#!/usr/bin/env python3
"""Build a degenerate-document corpus for the ORACLE-side gate: the
engine-side no-crash blanket (DegenerateInputsSpec) cannot see
cross-ENGINE divergences — a query that returns different rows than
its DuckDB oracle on a NULL or empty doc "passes by corpus luck" on
the shipped testdata, which contains neither. This script augments a
testdata sf dir with exactly those shapes so check_oracle.py can
compare the two sides on them:

  - one NULL-text document  (doc_id = max_doc + 100000, n_chars 0)
  - one EMPTY-text document (doc_id = max_doc + 200000, n_chars 0)
  - one WHITESPACE-only document ('  \t ', max_doc + 300000)
  - one SINGLE-CHARACTER document ('x', max_doc + 400000) — minimal
    decodable multimodal payload: 1-sample WAV (zero_cross needs a
    lagged neighbor that doesn't exist), 1-byte-derived 8x8 PNG
  - one 64x-SAME-CHARACTER document (max_doc + 500000) — every pHash
    probe sample equals the mean, so BOTH engines must agree the
    strict `>` threshold gives the all-zero hash (and agree on the
    resulting ham=0 bucket pairs in q164)
  - one document of EXACTLY 4096 chars (max_doc + 600000) — q173's
    oracle samples generate_series(0, 4095): this row pins the cap
    boundary where engine-decoded n_samples must still equal the
    oracle's series length
  - two degenerate EVENTS: NULL event_type + NULL value + NULL props
    (max_event + 100000), and empty-string event_type with value 0
    (max_event + 200000) — both at the first event's ts/user so they
    land inside existing windows/sessions rather than extending the
    time range
  - one NULL-embedding row (max_vec + 100000), one EMPTY-array embedding
    (max_vec + 200000), and one all-ZERO vector of the corpus dimension
    (max_vec + 300000) — zero norm makes cosine 0/0: engines disagree on
    NaN ordering (Spark ranks NaN above every number in DESC sorts)

Injected ids are derived from MAX(id) + offset (not min + offset): on a
source dir with >= 100k rows a min-based offset could collide with a
real id, silently duplicating a key and corrupting the gate's joins.

CORRUPT/TRUNCATED media payloads deliberately canNOT flow through this
gate: q164/q172/q173 derive their PNG/WAV payloads from `text` INSIDE
the query (encode -> codec), so every corpus row yields a structurally
valid container by construction, and there is no payload column to
corrupt here. The undecodable-payload contract (one bad blob = one
fallback row, never a dead task) is pinned engine-side instead:
MultimodalSpec "undecodable payloads keep the byte-derived fallback"
(truncated PNG) and "audio: undecodable payloads keep the byte-derived
fallback" (truncated WAV), plus the mixed decodable/undecodable
imageSummary equivalence test.

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
    # injected ids ride on MAX(id): offsets from the first id can
    # collide with real rows once the source exceeds the offset span
    con.execute(f"""
    COPY (
      WITH mx AS (SELECT max(doc_id) AS m
                  FROM read_parquet('{src}/documents.parquet'))
      FROM read_parquet('{src}/documents.parquet')
      UNION ALL BY NAME
      (SELECT (SELECT m FROM mx) + 100000 AS doc_id, NULL AS text,
              lang, source, 0 AS n_chars
       FROM read_parquet('{src}/documents.parquet')
       ORDER BY doc_id LIMIT 1)
      UNION ALL BY NAME
      (SELECT (SELECT m FROM mx) + 200000 AS doc_id, '' AS text,
              lang, source, 0 AS n_chars
       FROM read_parquet('{src}/documents.parquet')
       ORDER BY doc_id LIMIT 1)
      UNION ALL BY NAME
      (SELECT (SELECT m FROM mx) + 300000 AS doc_id, '  \t ' AS text,
              lang, source, 4 AS n_chars
       FROM read_parquet('{src}/documents.parquet')
       ORDER BY doc_id LIMIT 1)
      UNION ALL BY NAME
      (SELECT (SELECT m FROM mx) + 400000 AS doc_id, 'x' AS text,
              lang, source, 1 AS n_chars
       FROM read_parquet('{src}/documents.parquet')
       ORDER BY doc_id LIMIT 1)
      UNION ALL BY NAME
      (SELECT (SELECT m FROM mx) + 500000 AS doc_id,
              repeat('a', 64) AS text, lang, source, 64 AS n_chars
       FROM read_parquet('{src}/documents.parquet')
       ORDER BY doc_id LIMIT 1)
      UNION ALL BY NAME
      (SELECT (SELECT m FROM mx) + 600000 AS doc_id,
              repeat('quux ', 819) || 'q' AS text, lang, source,
              4096 AS n_chars
       FROM read_parquet('{src}/documents.parquet')
       ORDER BY doc_id LIMIT 1)
    ) TO '{out}/documents.parquet' (FORMAT PARQUET)
    """)
    # events.parquet may carry TIMESTAMP(NANOS) — rebuild the column
    # as-is via DuckDB (it normalizes to TIMESTAMP, which the engine's
    # reader also accepts; TESTDATA.md documents all three encodings)
    con.execute(f"""
    COPY (
      WITH mx AS (SELECT max(event_id) AS m
                  FROM read_parquet('{src}/events.parquet'))
      FROM read_parquet('{src}/events.parquet')
      UNION ALL BY NAME
      (SELECT (SELECT m FROM mx) + 100000 AS event_id, ts, user_id,
              NULL AS event_type, NULL AS value, NULL AS props
       FROM read_parquet('{src}/events.parquet')
       ORDER BY event_id LIMIT 1)
      UNION ALL BY NAME
      (SELECT (SELECT m FROM mx) + 200000 AS event_id, ts, user_id,
              '' AS event_type, 0.0 AS value, props
       FROM read_parquet('{src}/events.parquet')
       ORDER BY event_id LIMIT 1)
    ) TO '{out}/events.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
    COPY (
      WITH mx AS (SELECT max(vec_id) AS m
                  FROM read_parquet('{src}/embeddings.parquet'))
      FROM read_parquet('{src}/embeddings.parquet')
      UNION ALL BY NAME
      (SELECT (SELECT m FROM mx) + 100000 AS vec_id, NULL AS embedding, label
       FROM read_parquet('{src}/embeddings.parquet')
       ORDER BY vec_id LIMIT 1)
      UNION ALL BY NAME
      (SELECT (SELECT m FROM mx) + 200000 AS vec_id,
              []::FLOAT[] AS embedding, label
       FROM read_parquet('{src}/embeddings.parquet')
       ORDER BY vec_id LIMIT 1)
      UNION ALL BY NAME
      (SELECT (SELECT m FROM mx) + 300000 AS vec_id,
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
