#!/usr/bin/env python3
"""Oracle-SQL type lint: DESCRIBE every registered oracle SQL against
DuckDB and fail if any output column is HUGEINT/UHUGEINT (int128).

Background (r15 verdict): the driver hashes the oracle's NATIVE-typed
values, and DuckDB widens sum(BIGINT) / integer `//` chains to HUGEINT,
which serializes differently from Spark's BIGINT even when every value
is equal — s03_stream_packing was driver hash-red for four rounds on
exactly this. This sweep is the dynamic half of the contract; the
static half is OracleLintSpec in the ScalaTest suite.

Dev-only tooling (driver-side python env); not part of the Spark library.
Usage: scripts/lint_oracle_types.py [sfDir] [oracle_sql.json] [--emit manifest.json]

--emit writes the golden manifest OracleLintSpec checks at sbt-test time:
{name: {"sha256": <sha of the sql text>, "cols": {col: duckdb_type}}}.
Regenerate after any oracle change:
  sbt "runMain graft.Verify --dump-oracles /tmp/oracle_sql.json"
  scripts/lint_oracle_types.py /root/testdata/sf0.001 /tmp/oracle_sql.json \
      --emit src/test/resources/oracle_types.json
"""
import hashlib, json, sys
from pathlib import Path

import duckdb

argv = sys.argv[1:]
EMIT = None
if "--emit" in argv:
    k = argv.index("--emit")
    if k + 1 >= len(argv):
        sys.exit("--emit needs a path argument")
    EMIT = Path(argv[k + 1])  # the token AFTER --emit, wherever it appears
    argv = argv[:k] + argv[k + 2:]
SF = argv[0] if len(argv) > 0 else "/root/testdata/sf0.001"
ORACLE = Path(argv[1] if len(argv) > 1 else "/tmp/verify_out/oracle_sql.json")

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.loads(ORACLE.read_text())
BAD = {"HUGEINT", "UHUGEINT"}

n_bad = n_err = 0
manifest = {}
for name, sql in sorted(oracle.items()):
    try:
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
    except Exception as e:
        # some oracles don't DESCRIBE (temp state / multi-statement):
        # fall back to EXECUTING the query and reading the cursor's
        # result schema — full execution, fine at the sf0.001 sweep scale
        try:
            cur = con.execute(sql)
            desc = [(c[0], str(c[1]).upper()) for c in cur.description]
        except Exception as e2:
            print(f"ERR  {name}: cannot DESCRIBE: {e2}")
            n_err += 1
            continue
    cols = {}
    for col, typ, *_ in desc:
        t = str(typ).upper()
        cols[str(col)] = t
        if any(b in t for b in BAD):
            print(f"BAD  {name}: column `{col}` is {t} — cast it in the oracle SQL")
            n_bad += 1
    manifest[name] = {
        "sha256": hashlib.sha256(sql.encode("utf-8")).hexdigest(),
        "cols": cols,
    }

if EMIT is not None:
    EMIT.write_text(json.dumps(manifest, indent=1, sort_keys=True) + "\n")
    print(f"emitted {len(manifest)} entries to {EMIT}")

print(f"\n{len(oracle)} oracles swept: {n_bad} int128 columns, {n_err} describe errors")
sys.exit(1 if (n_bad or n_err) else 0)
