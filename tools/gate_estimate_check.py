#!/usr/bin/env python3
"""Cross-engine check of substringSpans' maxMatchRows gate estimate.

The gate refuses when Σ_h (tot² − Σ_doc occ²)/2 over cross-doc-eligible
shingle hashes (2 ≤ distinct docs ≤ dfCap) exceeds the bound — the
EXACT pre-window cardinality of the hash self-join. This tool
recomputes that quantity independently in DuckDB, reusing the SAME
hash chain the q137 oracle ships (extracted from the Verify dump's
oracle_sql.json so the two sides can never drift), and compares it
digit-for-digit against the engine's own estimate as printed by
`graft.ABGateEstimate` (the gate's refusal message at maxMatchRows=1).

  sbt -batch "runMain graft.ABGateEstimate /root/testdata/sf0.01"
      -> {"gate_estimate": N, ...}
  python3 tools/gate_estimate_check.py <sfDir> <verifyOutDir> N

The sh CTE filters len(tk) >= 8 — the engine's `nt >= L` guard — so
sub-L documents contribute nothing on either side (the q137 ORACLE
instead emits partial shingles for them, which its df-filter discards
before output; the estimate must exclude them up front).
"""
import json
import os
import re
import sys

import duckdb

sf, out, engine_est = sys.argv[1], sys.argv[2], int(sys.argv[3])
oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
q137 = oracle["q137_substring_spans"]
# the oracle's ph CTE line: "SELECT doc_id, pos, <hash expr> AS hh FROM posts"
m = re.search(r"SELECT doc_id, pos, (.*?) AS hh FROM posts", q137, re.S)
assert m, "q137 oracle shape changed - update the extraction"
hash_expr = m.group(1).replace("\n", " ")

con = duckdb.connect()
p = f"{sf}/documents.parquet"
src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
con.execute(f"CREATE VIEW documents AS SELECT * FROM {src}")
duck_est = con.execute(f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
    t -> t <> '') AS tk
  FROM documents
), sh AS (
  SELECT doc_id, [array_to_string(tk[i:i+7], ' ')
                  FOR i IN range(1, len(tk) - 7 + 1)] AS ss
  FROM toks WHERE len(tk) >= 8
), posts AS (
  SELECT doc_id, unnest(ss) AS sg FROM sh
), ph AS (
  SELECT doc_id, {hash_expr} AS hh FROM posts
), perid AS (
  SELECT hh, doc_id, count(*) AS c FROM ph GROUP BY hh, doc_id
), perh AS (
  SELECT hh, count(*) AS nd, sum(c) AS tot, sum(c * c) AS s2
  FROM perid GROUP BY hh
)
SELECT CAST(coalesce(sum((tot * tot - s2) // 2), 0) AS BIGINT)
FROM perh WHERE nd BETWEEN 2 AND 64""").fetchone()[0]

ok = duck_est == engine_est
print(f"engine={engine_est} duckdb={duck_est} -> {'EXACT MATCH' if ok else 'MISMATCH'}")
sys.exit(0 if ok else 1)
