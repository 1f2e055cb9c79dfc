#!/usr/bin/env python3
"""Build the ~10x scale-soak corpus from an existing testdata dir.

Self-union with re-keyed ids (the sanctioned construction): documents
replicated K times with doc_id offset by i*1_000_000 per copy,
embeddings with vec_id offset by i*10_000_000. Dev-loop tooling only
(duckdb is the driver-side oracle engine; the engine under test never
uses this) — the output feeds the COVERAGE "scale soak" table and the
SoakShapeSpec plan-shape gate.

    python3 scripts/build_soak.py /root/testdata/sf0.1 /tmp/graft_soak10 10
"""
import sys

import duckdb

src, dst, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
import os
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()
con.execute(f"""
  COPY (SELECT doc_id + 1000000 * i AS doc_id, text, lang, source, n_chars
        FROM read_parquet('{src}/documents.parquet'), range({k}) t(i))
  TO '{dst}/documents.parquet' (FORMAT PARQUET)""")
con.execute(f"""
  COPY (SELECT vec_id + 10000000 * i AS vec_id, label, embedding
        FROM read_parquet('{src}/embeddings.parquet'), range({k}) t(i))
  TO '{dst}/embeddings.parquet' (FORMAT PARQUET)""")
# events: copies shift 30 days apart so no time-bounded join (6h windows,
# as-of lookbacks) ever pairs rows ACROSS copies — k x data => k x pairs,
# a clean linear contract (unlike the dedup tables, where self-union
# duplication density deliberately grows the work super-linearly)
con.execute(f"""
  COPY (SELECT event_id + 10000000 * i AS event_id, user_id,
               ts + INTERVAL (30 * i) DAY AS ts, value
        FROM read_parquet('{src}/events.parquet'), range({k}) t(i))
  TO '{dst}/events.parquet' (FORMAT PARQUET)""")
for t in ("documents", "embeddings", "events"):
    n, = con.execute(f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()
    print(f"{t}: {n} rows")
