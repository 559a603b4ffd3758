# Per-iteration scale check for the q178 GD trainer — full-weight hash
# evidence at volumes where the 6-iteration WITH-chain oracle is
# unaffordable (23 DuckDB-minutes at 10x, SCALE.md).
#
# Mechanism (see graft.TrainerDump / OracleSql.gdTrainerStepSql): the
# engine exports every iteration's 1024-weight vector; the expensive
# term-stream derivation (tokenize -> unigram+bigram -> poly31+mix64
# buckets) materializes ONCE as DuckDB tables; then each transition
# w_t -> w_{t+1} is re-derived independently with the engine's w_t
# injected, and ALL m weights are compared digit-for-digit. Induction
# closes the chain: w_0 = zeros by construction, so 6 green transitions
# = the full training loop verified. The final scores are re-derived
# from the final weights and compared row-for-row.
#
# Usage:
#   sbt -batch "runMain graft.TrainerDump /tmp/sf3x /tmp/q178_30x"
#   python3 tools/q178_scale_check.py /tmp/sf3x /tmp/q178_30x
import sys, os, json, glob, time
import duckdb

sf, dump = sys.argv[1], sys.argv[2]
meta = json.load(open(os.path.join(dump, "sql.json")))
weights = json.load(open(os.path.join(dump, "weights.json")))

# file-backed DB + explicit budget + spill dir: the in-memory default
# (% of RAM at connect) is fragile right after a Spark JVM exits, and
# the materialized gtr table (50M+ rows at 100x) must be able to page
dbpath = os.path.join(dump, "check.duckdb")
if os.path.exists(dbpath):
    os.remove(dbpath)
con = duckdb.connect(dbpath)
if os.environ.get("CHECK_THREADS"):
    con.execute(f"SET threads TO {int(os.environ['CHECK_THREADS'])}")
con.execute(f"SET memory_limit='{os.environ.get('CHECK_MEM', '48GB')}'")
con.execute(f"SET temp_directory='{os.path.join(dump, 'duck_tmp')}'")
p = f"{sf}/documents.parquet"
src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
con.execute(f"CREATE VIEW documents AS SELECT * FROM {src}")

t0 = time.time()
for stmt in meta["prefix"]:
    con.execute(stmt)
nterms, ndocs = con.execute(
    "SELECT (SELECT count(*) FROM gtr), (SELECT count(*) FROM gcnt)").fetchone()
# the per-doc ordered-list fold (z) is the memory hot spot — DuckDB's
# in-aggregate ORDER BY cannot spill — so the doc set is processed in
# shards of <= ~8M term occurrences; the gradient is an exact integer
# sum, so per-shard partials accumulate bit-identically (see
# OracleSql.gdTrainerStepSql)
nshards = int(os.environ.get("CHECK_SHARDS", 0)) or max(1, nterms // 8000000)
print(f"[prefix] {nterms} term occurrences / {ndocs} docs "
      f"materialized in {time.time() - t0:.1f} s, {nshards} shards", flush=True)


def load_gwin(w):
    con.execute("CREATE OR REPLACE TABLE gwin(b INT, w DOUBLE)")
    con.executemany("INSERT INTO gwin VALUES (?, ?)", list(enumerate(w)))


fails = 0
for t in range(meta["iters"]):
    it0 = time.time()
    load_gwin(weights[t])
    con.execute("CREATE OR REPLACE TABLE ggacc(b INT, gs BIGINT)")
    for s in range(nshards):
        con.execute("INSERT INTO ggacc " + meta["step_partial"]
                    .replace("{NSHARDS}", str(nshards))
                    .replace("{SHARD}", str(s)))
    got = [w for (_, w) in con.execute(meta["update"]).fetchall()]
    exp = weights[t + 1]
    bad = [b for b in range(len(exp)) if got[b] != exp[b]]
    status = "PASS" if not bad else f"FAIL ({len(bad)} weights, first b={bad[:5]})"
    if bad:
        fails += 1
    print(f"[iter {t}->{t + 1}] {status}  ({len(exp)} weights, "
          f"{time.time() - it0:.1f} s)", flush=True)

it0 = time.time()
load_gwin(weights[meta["iters"]])
oracle = {}
for s in range(nshards):
    for r in con.execute(meta["score"]
                         .replace("{NSHARDS}", str(nshards))
                         .replace("{SHARD}", str(s))).fetchall():
        oracle[r[0]] = (r[1], r[2])
spark = {}
for f in glob.glob(os.path.join(dump, "scores", "*.parquet")):
    for r in con.execute(f"SELECT doc_id, y, score FROM '{f}'").fetchall():
        spark[r[0]] = (r[1], r[2])
mism = [k for k in oracle if oracle[k] != spark.get(k)]
extra = [k for k in spark if k not in oracle]
ok = not mism and not extra
print(f"[scores] {'PASS' if ok else 'FAIL'}  ({len(oracle)} docs, "
      f"{len(mism)} mismatched, {len(extra)} extra, "
      f"{time.time() - it0:.1f} s)", flush=True)
if not ok:
    fails += 1

print(f"\n{fails} failures")
sys.exit(1 if fails else 0)
