# Mechanical round close (r14 judge #1): two consecutive rounds of green
# engineering each shipped with an artifact-hygiene miss (r13: no driver
# correctness file adjudication; r14: BENCH_r14_full.json +
# CORRECTNESS_local_r14.json engineered but never committed, and
# SCALE.md claimed one of them WAS committed). This script makes the
# close checklist executable and FAILS LOUDLY if any artifact is
# missing, so "done" means "committed", not "engineered".
#
#   python3 tools/close_round.py <N>
#
# Checks (performing the purely mechanical ones itself):
#   1. BENCH_r{N}_full.json exists — if not, promotes bench_full.json
#      when its canary sits in the quiet band [0.47, 0.92]s; otherwise
#      prints the re-capture command and fails.
#   2. CORRECTNESS_local_r{N}.json exists, n_fail == 0, and the oracle
#      replay stayed inside its budget (the r12/r13 empty-driver-file
#      root cause was silent replay growth past the driver's budget).
#   3. Runs bench_diff vs round N-1 and writes ab/bench_diff_r{N}.txt;
#      SCALE.md must cite that artifact by name (paste or reference).
#   4. Every BENCH_*/CORRECTNESS_* artifact SCALE.md mentions actually
#      exists — the exact falsehood class the r14 verdict flagged
#      (SCALE.md:1137 cited a file that was never committed).
#   5. All required artifacts are git-tracked (committed or staged).
import json, os, re, shutil, subprocess, sys

CANARY_BAND = (0.47, 0.92)

if len(sys.argv) != 2 or not sys.argv[1].isdigit():
    sys.exit("usage: python3 tools/close_round.py <round-number>")
n = int(sys.argv[1])
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(repo)
errs = []

def fail(msg, fix):
    errs.append(f"MISSING: {msg}\n    fix: {fix}")

# 1. per-query bench capture, canary-gated ------------------------------
bench = f"BENCH_r{n:02d}_full.json"
# -Xmx8g, NOT 96g: the committed in-band captures (r12/r13) ran via
# `sbt runMain` whose forked JVM uses -Xmx8g (build.sbt SPARK_DRIVER_MEM
# default); the 96g this command prescribed in r14/r15 inflates the
# canary ~1.4x through late-run G1 mixed collections — the measured
# root cause of three rounds of "out-of-band" captures (SCALE.md
# §round-16 canary forensics table).
recapture = ("SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 "
             "java -Xmx8g -cp 'target/scala-2.13/classes:/opt/spark/jars/*' "
             f"graft.Bench && cp bench_full.json {bench}")
def _prev_bench_commit_unix():
    # commit time of the previous round's bench artifacts — any capture
    # stamped before this moment predates the current round and must
    # not be promoted as round N's (r15 advisor: a stale in-band
    # bench_full.json would otherwise be silently promoted)
    r = subprocess.run(
        ["git", "log", "-1", "--format=%ct", "--",
         f"BENCH_r{n - 1:02d}_full.json", f"BENCH_r{n - 1:02d}.json"],
        capture_output=True, text=True).stdout.strip()
    return int(r) if r else 0

# the capture file to promote: honor SPARK_GRAFT_BENCH_OUT exactly like
# graft.Bench does (r16 advisor: validating the hardcoded default path
# while a fresh capture went to the env path would leave an older
# same-round default-path file silently promotable — the stamped file
# this gate validates must be the one the capture actually wrote)
capture_path = os.environ.get("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
if not os.path.exists(bench):
    if os.path.exists(capture_path):
        payload = json.load(open(capture_path))
        c = payload.get("canary_sec")
        stamp = payload.get("captured_unix")  # emitted by graft.Bench since r16
        floor_unix = _prev_bench_commit_unix()
        if c is None or not (CANARY_BAND[0] <= c <= CANARY_BAND[1]):
            fail(f"{bench}: {capture_path} canary {c}s outside quiet band "
                 f"{CANARY_BAND} — noisy capture, not promotable", recapture)
        elif stamp is None:
            fail(f"{bench}: {capture_path} has no captured_unix stamp — "
                 "pre-r16 capture of unknown provenance, not promotable",
                 recapture)
        elif stamp < floor_unix:
            fail(f"{bench}: {capture_path} captured_unix {stamp} predates "
                 f"round {n - 1}'s bench commit ({floor_unix}) — stale "
                 "capture from an earlier round, not promotable", recapture)
        else:
            shutil.copy(capture_path, bench)
            print(f"promoted {capture_path} -> {bench} "
                  f"(canary {c}s in band, stamp {stamp} fresh)")
    else:
        fail(f"{bench} (no {capture_path} to promote either)", recapture)
if os.path.exists(bench):
    c = json.load(open(bench)).get("canary_sec")
    if c is None or not (CANARY_BAND[0] <= c <= CANARY_BAND[1]):
        fail(f"{bench} canary {c}s outside quiet band {CANARY_BAND}", recapture)

# 2. local correctness twin, green + in-budget --------------------------
corr = f"CORRECTNESS_local_r{n:02d}.json"
corr_cmd = (f"sbt 'runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_r{n}' && "
            f"CHECK_JSON={corr} python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_r{n}")
if not os.path.exists(corr):
    fail(corr, corr_cmd)
else:
    d = json.load(open(corr))
    if d.get("n_fail", 1) != 0:
        fail(f"{corr} has n_fail={d.get('n_fail')} — round must close green", corr_cmd)
    if d.get("replay_over_budget"):
        fail(f"{corr}: oracle replay {d.get('oracle_replay_sec')}s exceeded its "
             f"budget of {d.get('replay_budget_sec')}s",
             "trim the slowest oracles (check.py prints them) before closing")

# 3. bench_diff artifact vs the previous round --------------------------
prev = f"BENCH_r{n - 1:02d}_full.json"
diff_art = f"ab/bench_diff_r{n:02d}.txt"
def _git_tracked(path):
    return subprocess.run(["git", "ls-files", "--error-unmatch", path],
                          capture_output=True).returncode == 0
if os.path.exists(diff_art) and _git_tracked(diff_art):
    # committed artifacts are immutable history: a re-run of this gate
    # (same round or a later round's adjudication) must VALIDATE them,
    # never regenerate them (r16 verdict #4 — the r15 close rewrote
    # ab/bench_diff_r16.txt, byte-identical only by luck of determinism)
    print(f"{diff_art} already committed — validating, not regenerating")
elif os.path.exists(prev) and os.path.exists(bench):
    os.makedirs("ab", exist_ok=True)
    r = subprocess.run([sys.executable, "tools/bench_diff.py", prev, bench],
                       capture_output=True, text=True)
    open(diff_art, "w").write(r.stdout + r.stderr)
    print(f"wrote {diff_art} ({len(r.stdout.splitlines())} lines)")
elif not os.path.exists(prev):
    print(f"note: {prev} absent — skipping bench_diff leg")
scale = open("SCALE.md").read() if os.path.exists("SCALE.md") else ""
# the round-N section: from its `## Round N …` heading to the next `## `
# heading (r15 advisor: scanning ALL of SCALE.md trips on historical
# prose that *narrates* a file as never committed — the gate is that the
# CURRENT round's section makes no phantom claims)
m = re.search(rf"^## Round {n}\b.*?(?=^## |\Z)", scale, re.M | re.S)
section = m.group(0) if m else ""
if not m:
    fail(f"SCALE.md has no `## Round {n}` section",
         f"write the round-{n} narrative section in SCALE.md")
if os.path.exists(diff_art) and os.path.basename(diff_art) not in section:
    fail(f"SCALE.md round-{n} section does not cite {diff_art}",
         f"paste or reference {diff_art} in the round-{n} SCALE.md section")

# 4. no phantom artifacts in the round-N SCALE.md section ---------------
cited = set(re.findall(r"\b(?:BENCH|CORRECTNESS)[A-Za-z0-9_]*\.json\b", section))
for f in sorted(cited):
    if not os.path.exists(f):
        fail(f"SCALE.md round-{n} section cites {f} but it does not exist "
             "in the tree", "create the artifact or correct the sentence")

# 5. everything above must be git-tracked -------------------------------
tracked = set(subprocess.run(["git", "ls-files"], capture_output=True,
                             text=True).stdout.split())
staged = set(subprocess.run(["git", "diff", "--cached", "--name-only"],
                            capture_output=True, text=True).stdout.split())
for f in [bench, corr, diff_art]:
    if os.path.exists(f) and f not in tracked and f not in staged:
        fail(f"{f} exists but is not git-tracked", f"git add {f} && git commit")

if errs:
    print(f"\nround {n} close: {len(errs)} problem(s)\n")
    print("\n".join(errs))
    sys.exit(1)
print(f"\nround {n} close: all artifacts present, green, in-band, and tracked")
