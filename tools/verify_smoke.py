# Handoff smoke test: asserts a `graft.Verify` output directory fulfils
# the contract the driver's DuckDB compare needs, in one command:
#   python3 tools/verify_smoke.py <outDir> [minQueries]
#
#  - oracle_sql.json exists, json.load()s, and has >= minQueries entries
#    (default 199 = the current catalog size);
#  - every oracle entry has a sibling query dir containing >= 1
#    non-empty .parquet part (and pyarrow can open it);
#  - no query dir exists WITHOUT an oracle entry (a stray dir means the
#    dump and the manifest disagree about the catalog).
#
# Exit 0 = the handoff artifact is complete; any nonzero = the driver
# compare would have produced an empty/partial round, with the reason
# printed. Round-13 armor for the CORRECTNESS_r12.json == {} incident:
# run after Verify at round close and commit the output alongside
# CORRECTNESS_local_r{N}.json.
import glob
import json
import os
import sys

out = sys.argv[1]
min_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 199

problems = []

manifest_path = os.path.join(out, "oracle_sql.json")
try:
    oracle = json.load(open(manifest_path))
except Exception as e:
    print(f"FATAL: {manifest_path} not loadable: {e}")
    sys.exit(2)

if len(oracle) < min_queries:
    problems.append(f"manifest has {len(oracle)} entries, expected >= {min_queries}")

try:
    import pyarrow.parquet as pq
except ImportError:
    pq = None
    problems.append("pyarrow unavailable: parquet readability not checked")

for name in sorted(oracle):
    qdir = os.path.join(out, name)
    parts = glob.glob(f"{qdir}/*.parquet")
    if not os.path.isdir(qdir):
        problems.append(f"{name}: no output dir")
    elif not parts:
        problems.append(f"{name}: dir exists but holds no .parquet part")
    elif all(os.path.getsize(p) == 0 for p in parts):
        problems.append(f"{name}: all parquet parts are 0 bytes")
    elif pq is not None:
        try:
            pq.read_schema(parts[0])
        except Exception as e:
            problems.append(f"{name}: parquet unreadable: {e}")

stray = [d for d in os.listdir(out)
         if os.path.isdir(os.path.join(out, d)) and d not in oracle]
for d in sorted(stray):
    problems.append(f"stray query dir without an oracle entry: {d}")

if problems:
    for p in problems:
        print("PROBLEM:", p)
    print(f"\nFAIL: {len(problems)} problems in {out}")
    sys.exit(1)
print(f"OK: {len(oracle)} oracle entries, every query dir present and readable in {out}")
